"""Eval-render throughput vs ray-block size (one chip).

bench.py measures 16384 rays/call; the reference's flagship ray_chunk is
32768. Larger blocks amortize the sequential Pallas grid + dispatch floor.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_batch_size.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


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


def main():
    log("backend:", jax.default_backend())
    for n_rays in (16384, 32768, 65536):
        cfg = NeRFConfig(
            n_samples=64, n_importance=128, use_semantics=True,
            sem_with_coord=True, ray_block=n_rays, remat=False,
            compute_dtype="bfloat16", fused_field=True,
        )
        net = NeRFNet(cfg)
        params = net.init(jax.random.PRNGKey(0))
        rays = jax.random.normal(jax.random.PRNGKey(1), (2, n_rays, 3))
        render = jax.jit(lambda p, r, net=net: net(
            p, r, (1.2, 14.72), train=False, coarse_outputs=False)["rgb"])
        dt = time_fn(render, params, rays)
        log(f"eval render n={n_rays}: {dt*1e3:7.1f} ms = {n_rays/dt:,.0f} rays/s")


if __name__ == "__main__":
    main()
