"""Probe eval RAY_BLOCK 24 (4608 pts/block) for the fused eval render.

The adaptive target is 3072 pts (16 rays at fine S=192); 6144-pt blocks are
rejected by the remote compiler. 24 rays = 4608 pts is the untried middle.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 580 python tools/perf_eval_block24.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


R = 65536
cfg = NeRFConfig(
    n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
    ray_block=R, remat=False, compute_dtype="bfloat16", fused_field=True,
)
net = NeRFNet(cfg)
params = net.init(jax.random.PRNGKey(0))
rays = jax.random.normal(jax.random.PRNGKey(1), (2, R, 3))


def render(p):
    return net(p, rays, (1.2, 14.72), train=False, coarse_outputs=False)["rgb"]


for target in (3072, 4608):
    fr._EVAL_TARGET_N = target
    try:
        f = jax.jit(render)
        dt = bench.time_fn(f, params, iters=4)
        log(f"eval target_n={target} (fine {fr._eval_ray_block(192)} rays, "
            f"coarse {fr._eval_ray_block(64)}): {dt*1e3:.1f} ms = {R/dt:,.0f} rays/s")
    except Exception:
        log(f"eval target_n={target}: FAILED\n{traceback.format_exc(limit=3)}")
fr._EVAL_TARGET_N = 3072
