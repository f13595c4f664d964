"""On-chip check + perf for the planar fused mip-NeRF (IPE) kernel.

1. Parity: on-chip planar mip render vs the CPU fp32 interpret golden
   (the round-1 rule: interpret tests cannot catch on-chip bugs — PE/IPE
   phases must survive the MXU).
2. Timing: mip eval render, XLA field vs planar fused kernel, 16384 rays x
   64+128 samples (the flagship shape with the mip model).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_mip_planar.py
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.mip import MipNeRFNet
from nerfsos_tpu.models.nerf import NeRFConfig


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

    # ---- parity vs the CPU fp32 golden (small shape) ----
    cfg32 = NeRFConfig(n_samples=8, n_importance=8, multires=10,
                       multires_views=4, ray_block=4096,
                       compute_dtype="float32", fused_field=True)
    net32 = MipNeRFNet(cfg32)
    params32 = net32.init(jax.random.PRNGKey(0))
    rays_s = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3))

    # CPU golden: interpret-mode planar (fp32) fetched via pure_callback-free
    # path — run the SAME planar code with interpret=True by tracing on CPU
    # is not possible in-process here, so compare against the on-chip XLA
    # field (itself torch-verified) instead, at fp32.
    xla_net = MipNeRFNet(dataclasses.replace(cfg32, fused_field=False))
    a = jax.device_get(jax.jit(lambda p, r: xla_net(
        p, r, (1.0, 4.0), 0.001, train=False))(params32, rays_s))
    b = jax.device_get(jax.jit(lambda p, r: net32(
        p, r, (1.0, 4.0), 0.001, train=False))(params32, rays_s))
    for k in ("rgb", "acc", "depth"):
        rel = np.abs(np.asarray(a[k]) - np.asarray(b[k])).max() / (
            np.abs(np.asarray(a[k])).max() + 1e-9)
        log(f"on-chip mip planar vs XLA fp32 [{k}]: max rel {rel:.2e}")

    # ---- perf at the flagship shape, bf16 ----
    N = 16384
    cfg = NeRFConfig(n_samples=64, n_importance=128, multires=10,
                     multires_views=4, ray_block=N, remat=False,
                     compute_dtype="bfloat16", fused_field=True)
    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    for fused in (False, True):
        c = dataclasses.replace(cfg, fused_field=fused)
        net = MipNeRFNet(c)
        params = net.init(jax.random.PRNGKey(0))
        try:
            f = jax.jit(lambda p, r, n=net: n(p, r, (1.2, 14.72), 0.001,
                                              train=False)["rgb"])
            dt = time_fn(f, params, rays)
            name = "planar" if fused else "xla"
            log(f"mip render [{name}]: {dt*1e3:7.1f} ms = {N/dt:,.0f} rays/s")
        except Exception as e:
            log(f"mip render fused={fused} FAIL: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
