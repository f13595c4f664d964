"""Stage-by-stage render timing on the TPU: where do the 92.5 ms go?

Stages (flagship 16384 rays, 64+128 samples, bf16, fused field):
  A. coarse field only (16384 x 64 pts)
  B. fine field only (16384 x 192 pts)
  C. stratified sampling only
  D. importance sampling only (inverse-CDF + merge-sort)
  E. volumetric compositing only (both passes)
  F. full render (reference)
"""
import time

import jax
import jax.numpy as jnp

from nerfsos_tpu.core import sampling
from nerfsos_tpu.core.render import volumetric_render
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

N = 16384


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
    cfg = NeRFConfig(n_samples=64, n_importance=128, use_semantics=True,
                     sem_with_coord=True, ray_block=N, remat=False,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays = jax.random.normal(key, (2, N, 3))
    rays_o, rays_d = rays[0], rays[1]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    near = jnp.full((N, 1), 1.2)
    far = jnp.full((N, 1), 14.72)

    z_c = sampling.stratified_sample(key, near, far, 64, perturb=0.0, lindisp=False)
    pts_c = sampling.points_along_rays(rays_o, rays_d, z_c)
    raw_c = net._apply(params, "coarse", pts_c, viewdirs)
    ret_c = volumetric_render(raw_c, z_c, rays_d, raw_noise_std=0.0,
                              white_bkgd=False, use_semantics=True, noise_key=key)
    z_all, _ = sampling.importance_sample(key, z_c, ret_c["weights"], 128, det=True)
    pts_f = sampling.points_along_rays(rays_o, rays_d, z_all)

    fA = jax.jit(lambda p: net._apply(p, "coarse", pts_c, viewdirs)[..., 0])
    fB = jax.jit(lambda p: net._apply(p, "fine", pts_f, viewdirs)[..., 0])
    fC = jax.jit(lambda k: sampling.stratified_sample(k, near, far, 64, perturb=1.0, lindisp=False))
    fD = jax.jit(lambda k, w: sampling.importance_sample(k, z_c, w, 128, det=False)[0])
    fE = jax.jit(lambda r: volumetric_render(r, z_all, rays_d, raw_noise_std=0.0,
                                             white_bkgd=False, use_semantics=True,
                                             noise_key=key)["rgb"])
    raw_f = net._apply(params, "fine", pts_f, viewdirs)
    fF = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), train=False)["rgb"])

    for name, fn, args in [
        ("A coarse field (64 spp)", fA, (params,)),
        ("B fine field (192 spp)", fB, (params,)),
        ("C stratified sample", fC, (key,)),
        ("D importance sample", fD, (key, ret_c["weights"])),
        ("E composite (fine)", fE, (raw_f,)),
        ("F FULL render", fF, (params, rays)),
    ]:
        dt = time_fn(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    main()
