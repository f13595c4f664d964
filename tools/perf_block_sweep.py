"""Perf sweep: fused-field Pallas block sizes on the real chip.

Round-2 question (ROUND2_NOTES render-tail analysis): does a larger forward
block (fewer sequential grid steps) or a larger backward block (512 default,
VMEM-bounded) buy throughput on the flagship shape? Each variant is a fresh
jit so the FWD_BLOCK/BWD_BLOCK globals are read at trace time.

Also cross-checks backward numerics across block sizes on-chip (accumulation
order changes with the grid; rel err must stay ~1e-3-level bf16 noise).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_block_sweep.py
Results stream to stderr and accumulate in /tmp/block_sweep.json.
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.ops.pallas import fused_field as ff

results = {}


def rec(k, v):
    results[k] = v
    print(f"== {k}: {v}", file=sys.stderr, flush=True)
    with open("/tmp/block_sweep.json", "w") as f:
        json.dump(results, f, indent=1)


def guard(k, fn):
    try:
        rec(k, fn())
    except Exception:
        rec(k, "FAIL " + traceback.format_exc(limit=3).replace("\n", " | ")[:400])


print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr, flush=True)

# ---- backward numerics across block sizes (same math, different grid) ----
def bwd_parity():
    from nerfsos_tpu.models.nerf import NeRFConfig
    from nerfsos_tpu.ops.pallas.fused_field import _flatten_mlp_params, _fused_backward

    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True, compute_dtype="bfloat16")
    import nerfsos_tpu.models.nerf as mnerf

    net = mnerf.NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ws, bs = _flatten_mlp_params(params["coarse"]["mlp"], cfg.netdepth, True)
    ws, bs = tuple(ws), tuple(bs)
    N = 4096
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
    dirs = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(3), (N, 4 + cfg.sem_dim))
    out = {}
    for blk in (512, 1024):
        dws, dbs, _ = jax.jit(
            lambda w, b, p, d, gg, _blk=blk: _fused_backward(
                w, b, (p, d), gg, cfg.netdepth, (4,), cfg.multires,
                cfg.multires_views, True, True, "bfloat16",
                block=_blk, input_grads=False)
        )(ws, bs, pts, dirs, g)
        out[blk] = [jnp.asarray(x, jnp.float32) for x in dws]
    rels = [float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-12))
            for a, b in zip(out[512], out[1024])]
    return f"max dW rel err 512-vs-1024: {max(rels):.2e}"


guard("bwd_block_parity", bwd_parity)

# ---- forward block sweep (render) ----
for blk in (2048, 4096):
    ff.FWD_BLOCK = blk
    guard(f"render_fwd_block_{blk}", lambda: bench.bench_render(True))
ff.FWD_BLOCK = None

# ---- backward block sweep (train; fwd block at default 2048) ----
for bwd in (512, 1024):
    ff.BWD_BLOCK = bwd
    guard(f"train_bwd_block_{bwd}", lambda: bench.bench_train())
ff.BWD_BLOCK = None

print(json.dumps(results, indent=1))
