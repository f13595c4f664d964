"""Planar-kernel block/batch sweep on the chip.

The row-major kernels' block ceiling (fwd 2048 / bwd 1024; bigger dies in
remote regalloc) was measured pre-planar — re-sweep for the planar kernels,
plus render batch size now that the 42.7x-padded buffers are gone.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_planar_sweep.py
"""
import sys
import time
import traceback

import jax
import jax.numpy as jnp

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


def main():
    log("backend:", jax.default_backend())
    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = {"mlp": net.init(jax.random.PRNGKey(0))["coarse"]["mlp"]}
    Nf = 16384 * 192
    k = jax.random.split(jax.random.PRNGKey(1), 2)
    pdF = jnp.concatenate([jax.random.normal(k[0], (3, Nf)),
                           jax.random.normal(k[1], (3, Nf))], 0)

    # ---- fwd block sweep ----
    for blk in (2048, 3072, 4096, 8192):
        ff.FWD_BLOCK = blk
        try:
            f = jax.jit(lambda p, x: ff.fused_field_apply_planar(p, x, cfg)[0])
            dt = time_fn(f, params, pdF)
            log(f"planar fwd block {blk}: {dt*1e3:7.1f} ms")
        except Exception:
            log(f"planar fwd block {blk}: FAIL "
                + traceback.format_exc(limit=0).strip().splitlines()[-1][:90])
    ff.FWD_BLOCK = None

    # ---- bwd block sweep ----
    def loss(p, x):
        return jnp.sum(ff.fused_field_apply_planar(p, x, cfg))

    for blk in (1024, 1536, 2048):
        ff.BWD_BLOCK = blk
        try:
            g = jax.jit(lambda p, x: jax.grad(loss)(p, x)["mlp"]["rgb_linear"]["kernel"])
            dt = time_fn(g, params, pdF, iters=4)
            log(f"planar fwd+bwd block {blk}: {dt*1e3:7.1f} ms")
        except Exception:
            log(f"planar fwd+bwd block {blk}: FAIL "
                + traceback.format_exc(limit=0).strip().splitlines()[-1][:90])
    ff.BWD_BLOCK = None

    # ---- eval render batch sweep (planar path end-to-end) ----
    for n_rays in (16384, 32768, 65536):
        rcfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                          sem_with_coord=True, ray_block=n_rays, remat=False,
                          compute_dtype="bfloat16", fused_field=True)
        rnet = NeRFNet(rcfg)
        rparams = rnet.init(jax.random.PRNGKey(0))
        rays = jax.random.normal(jax.random.PRNGKey(1), (2, n_rays, 3))
        try:
            render = jax.jit(lambda p, r, rn=rnet: rn(
                p, r, (1.2, 14.72), train=False, coarse_outputs=False)["rgb"])
            dt = time_fn(render, rparams, rays)
            log(f"eval render n={n_rays}: {dt*1e3:7.1f} ms = {n_rays/dt:,.0f} rays/s")
        except Exception:
            log(f"eval render n={n_rays}: FAIL "
                + traceback.format_exc(limit=0).strip().splitlines()[-1][:90])


if __name__ == "__main__":
    main()
