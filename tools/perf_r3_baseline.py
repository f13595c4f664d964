"""Round-3 perf baseline: honest ceilings + profiler breakdowns.

Round 2 closed with "fields at 63-75% of the measured 94.8 TFLOPs ceiling",
but that ceiling was an 8x256 CHAIN microbench (ROUND1_NOTES) — and the
planar kernel's own 32.7 ms @ 3.1M pts works out to ~120 TFLOPs of useful
FLOPs, i.e. ABOVE it. So before optimizing further:

1. re-measure the ceiling properly: big square bf16 matmuls (chip peak) AND
   the field's actual shape (chained 256x256 at the kernel block size);
2. profile the current eval render (65536 rays) and train step (16384 rays)
   via jax.profiler over the tunnel, summing device-op durations by name;
3. time the planar field kernels in isolation at the production shapes and
   convert to useful-FLOPs rates.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 1800 python tools/perf_r3_baseline.py
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_field as ff


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=6, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def parse_trace(trace_dir, top=18):
    """Sum ph=='X' durations by op name for the TPU device pid."""
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        log("no trace found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = e.get("dur", 0) / 1e3  # us -> ms
            by_name[e.get("name", "?")] += dur
            total += dur
    log(f"  total device-op time: {total:.1f} ms (all iterations in trace)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        log(f"    {dur:9.2f} ms  {name[:110]}")


def bench_ceilings():
    log("=== ceilings ===")
    for n in (4096, 8192):
        a = jnp.ones((n, n), jnp.bfloat16)
        b = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32))
        dt = time_fn(f, a, b, iters=10)
        log(f"square {n}: {2*n**3/dt/1e12:.1f} TFLOPs bf16")

    # The field's shape: chained W^T h with [256,256] x [256,blk], 8 deep,
    # repeated 24x inside one jit (amortize dispatch). Useful == padded here.
    for blk in (2048, 4096, 8192, 32768):
        ws = [jnp.ones((256, 256), jnp.bfloat16) for _ in range(8)]
        h0 = jnp.ones((256, blk), jnp.bfloat16)

        @jax.jit
        def chain(h, ws=tuple(ws)):
            for _ in range(24):
                for w in ws:
                    h = jax.lax.dot_general(
                        w, h, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return h

        dt = time_fn(chain, h0, iters=6)
        fl = 24 * 8 * 2 * 256 * 256 * blk
        log(f"chain 8x256 blk={blk}: {fl/dt/1e12:.1f} TFLOPs bf16")


def field_rates(cfg, params):
    log("=== planar field kernel rates (useful FLOPs) ===")
    FWD_FLOPS = 1.269e6  # per point, semantic field (bench.py model)
    for N in (3_145_728, 12_582_912):
        pd = jax.random.normal(jax.random.PRNGKey(1), (6, N))
        f = jax.jit(lambda p, x: ff.fused_field_apply_planar(p, x, cfg))
        dt = time_fn(f, params, pd, iters=4)
        log(f"fwd N={N}: {dt*1e3:.1f} ms = {N*FWD_FLOPS/dt/1e12:.1f} TFLOPs useful")

    N = 4_194_304  # train-shape points (16384 rays x 256 samples)
    pd = jax.random.normal(jax.random.PRNGKey(1), (6, N))

    def loss(p, x):
        return jnp.sum(ff.fused_field_apply_planar(p, x, cfg))

    def gsum(p, x):
        g = jax.grad(loss)(p, x)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))

    g = jax.jit(gsum)
    dt = time_fn(g, params, pd, iters=4)
    log(f"fwd+bwd N={N}: {dt*1e3:.1f} ms = {N*3*FWD_FLOPS/dt/1e12:.1f} TFLOPs useful")


def profile_render_and_train():
    log("=== profiler: eval render 65536 rays ===")
    n = 65536
    cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                     sem_with_coord=True, ray_block=n, remat=False,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
    render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False,
                                      coarse_outputs=False)["rgb"])
    dt = time_fn(render, params, rays, iters=4)
    log(f"render: {dt*1e3:.1f} ms = {n/dt:,.0f} rays/s")
    td = "/tmp/r3_trace_render"
    with jax.profiler.trace(td):
        for _ in range(3):
            float(jnp.sum(render(params, rays)))
    parse_trace(td)

    log("=== profiler: train step 16384 rays ===")
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step

    nt = 16384
    cfgt = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                      sem_with_coord=True, ray_block=nt, remat=False,
                      compute_dtype="bfloat16", fused_field=True)
    nett = NeRFNet(cfgt)
    pt = nett.init(jax.random.PRNGKey(0))
    state = TrainState.create(pt, make_optimizer(5e-4))
    step = make_rgb_train_step(nett, 1.2, 14.72, donate=False)
    batch = {"rays": jax.random.normal(jax.random.PRNGKey(1), (2, nt, 3)),
             "target": jnp.zeros((nt, 3)), "masks": jnp.zeros((nt, 1))}

    def train_once(s, b, k):
        new_s, _ = step(s, b, k)
        return new_s.params["coarse"]["mlp"]["rgb_linear"]["kernel"]

    dt = time_fn(train_once, state, batch, jax.random.PRNGKey(2), iters=4)
    log(f"train: {dt*1e3:.1f} ms = {nt/dt:,.0f} rays/s")
    td = "/tmp/r3_trace_train"
    with jax.profiler.trace(td):
        for _ in range(3):
            float(jnp.sum(train_once(state, batch, jax.random.PRNGKey(2))))
    parse_trace(td)
    return cfgt, {"mlp": pt["fine"]["mlp"]}


def main():
    log("backend:", jax.default_backend(), jax.devices())
    bench_ceilings()
    cfg, params = profile_render_and_train()
    field_rates(cfg, params)


if __name__ == "__main__":
    main()
