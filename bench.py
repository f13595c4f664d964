"""Benchmark: flagship-config ray throughput on one TPU chip.

Workload = the reference's flagship render/train shape (LLFF flower SOS,
BASELINE.md): 8x256 coarse/fine MLPs with the semantic head, 64 stratified +
128 importance samples per ray, full volumetric pipeline. Measures BOTH
render (forward) and train (forward+backward+Adam) rays/sec; the JSON line
reports render throughput.

vs_baseline: the reference records no numbers (BASELINE.md); the denominator
is an estimated PyTorch-A100 render throughput of 50k rays/s for this exact
shape (256 field queries/ray x ~0.6 MFLOP fwd through the 8x256 MLP at fp32
~= 150 MFLOP/ray; A100 fp32 19.5 TFLOPs at ~40% utilization). The BASELINE
north-star is >=10x this.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_TORCH_RENDER_RAYS_PER_SEC = 50_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=8, warmup=2):
    """Wall-time fn with a host-visible data dependency on EVERY call —
    plain block_until_ready is not sufficient on remote-tunneled backends."""
    def run(n):
        acc = 0.0
        for _ in range(n):
            out = fn(*args)
            acc = acc + jnp.sum(out)
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def main():
    from nerfsos_tpu.engines.state import TrainState, make_optimizer
    from nerfsos_tpu.engines.trainer import make_rgb_train_step
    from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    N_RAYS = 16384
    base = dict(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N_RAYS, remat=False, compute_dtype="bfloat16",
    )
    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(key, (2, N_RAYS, 3))

    import os

    results = {}
    variants = [("xla", False)]
    if os.environ.get("BENCH_PALLAS"):
        # the fused kernel currently trails the XLA field (see ops/pallas);
        # opt-in to avoid paying its compile time on every driver run
        variants.append(("pallas", True))
    for name, fused in variants:
        cfg = NeRFConfig(**base, fused_field=fused)
        net = NeRFNet(cfg)
        params = net.init(jax.random.PRNGKey(0))

        render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False)["rgb"])
        dt = time_fn(render, params, rays)
        results[f"render_{name}"] = N_RAYS / dt
        log(f"render[{name}]: {dt*1e3:.1f} ms / {N_RAYS} rays = {N_RAYS/dt:,.0f} rays/s")

    # train step (remat off: fits HBM at this batch and runs ~16% faster;
    # production SOS batches (32k rays) flip remat back on via --ray_chunk)
    cfg = NeRFConfig(**base, fused_field=False)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, make_optimizer(5e-4))
    step = make_rgb_train_step(net, 1.2, 14.72, donate=False)
    batch = {"rays": rays, "target": jnp.zeros((N_RAYS, 3)),
             "masks": jnp.zeros((N_RAYS, 1))}

    def train_once(s, b, k):
        new_s, m = step(s, b, k)
        return new_s.params["coarse"]["mlp"]["rgb_linear"]["kernel"]

    dt = time_fn(train_once, state, batch, key, iters=5, warmup=2)
    results["train"] = N_RAYS / dt
    log(f"train: {dt*1e3:.1f} ms / {N_RAYS} rays = {N_RAYS/dt:,.0f} rays/s")

    value = max(v for k, v in results.items() if k.startswith("render"))
    print(json.dumps({
        "metric": "flower_flagship_render_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / A100_TORCH_RENDER_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
