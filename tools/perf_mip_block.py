"""Probe _EVAL_TARGET_N for the fused mip eval kernel (S=63/190 frustums).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 580 python tools/perf_mip_block.py
"""
import sys
import traceback

import jax

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.models.mip import MipNeRFNet
from nerfsos_tpu.models.nerf import NeRFConfig
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


n = 16384
cfg = NeRFConfig(n_samples=64, n_importance=128, multires=10, multires_views=4,
                 ray_block=n, remat=False, compute_dtype="bfloat16",
                 fused_field=True)
net = MipNeRFNet(cfg)
params = net.init(jax.random.PRNGKey(0))
rays = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))

for target in (1024, 1536, 2048):
    fr._MIP_TARGET_N = target
    try:
        render = jax.jit(lambda p, r: net(p, r, (1.2, 14.72), 0.001,
                                          train=False)["rgb"])
        dt = bench.time_fn(render, params, rays)
        log(f"mip target_n={target}: {dt*1e3:.1f} ms = {n/dt:,.0f} rays/s "
            f"(blocks: S63->{fr._eval_ray_block(63)} S190->{fr._eval_ray_block(190)} "
            f"S64->{fr._eval_ray_block(64)} S192->{fr._eval_ray_block(192)})")
    except Exception:
        log(f"mip target_n={target}: FAILED\n{traceback.format_exc(limit=3)}")
fr._MIP_TARGET_N = 1536
