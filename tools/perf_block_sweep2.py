"""Perf sweep round 2: sigma-only eval render, fwd 3072, bwd 1536/2048.

Also: on-chip parity of the new density-only kernel vs a CPU interpret-mode
golden (every kernel must be chip-checked at least once — round-1 PE lesson),
and the full fwd-4096 failure message (sweep 1 truncated it).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_block_sweep2.py
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
    with open("/tmp/block_sweep2.json", "w") as f:
        json.dump(results, f, indent=1)


def guard(k, fn):
    try:
        rec(k, fn())
    except Exception as e:
        rec(k, f"FAIL {type(e).__name__}: {str(e)[:300]}")


print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr, flush=True)


# ---- on-chip parity: sigma kernel vs CPU interpret golden -----------------
def sigma_parity():
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
    from nerfsos_tpu.ops.pallas.fused_field import fused_sigma_apply, _sigma_forward

    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True, compute_dtype="bfloat16")
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (4096, 8, 3))
    on_chip = jax.jit(lambda p, x: fused_sigma_apply(p, x, cfg))(params["coarse"], pts)
    mlp = params["coarse"]["mlp"]
    names = [f"pts_linears_{i}" for i in range(cfg.netdepth)] + ["alpha_linear"]
    ws = tuple(mlp[n]["kernel"] for n in names)
    bs = tuple(mlp[n]["bias"] for n in names)
    golden = _sigma_forward(ws, bs, pts.reshape(-1, 3), cfg.netdepth, (4,),
                            cfg.multires, "float32", interpret=True).reshape(on_chip.shape)
    rel = float(jnp.linalg.norm(on_chip - golden) / (jnp.linalg.norm(golden) + 1e-12))
    return f"on-chip vs CPU fp32 golden rel err {rel:.2e}"


guard("sigma_onchip_parity", sigma_parity)

# ---- sigma-only eval render (the user-facing image render path) -----------
def bench_eval_render():
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=bench.N_RAYS, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, bench.N_RAYS, 3))
    render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                      coarse_outputs=False)["rgb"])
    dt = bench.time_fn(render, params, rays)
    print(f"eval render: {dt*1e3:.1f} ms = {bench.N_RAYS/dt:,.0f} rays/s",
          file=sys.stderr, flush=True)
    return bench.N_RAYS / dt


guard("eval_render_sigma_coarse", bench_eval_render)

# ---- fwd 3072 + full 4096 error -------------------------------------------
for blk in (3072, 4096):
    ff.FWD_BLOCK = blk
    guard(f"render_fwd_block_{blk}", lambda: bench.bench_render(True))
ff.FWD_BLOCK = None

# ---- bwd 1536 / 2048 ------------------------------------------------------
for bwd in (1536, 2048):
    ff.BWD_BLOCK = bwd
    guard(f"train_bwd_block_{bwd}", lambda: bench.bench_train())
ff.BWD_BLOCK = None

print(json.dumps(results, indent=1))
