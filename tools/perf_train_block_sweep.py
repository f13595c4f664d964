"""Sweep TRAIN_RAY_BLOCK for the fused train render kernels (fwd + bwd).

The default is 8 rays/block (1536 pts at fine S=192); the eval kernel's
adaptive target of ~3072 pts/block measured faster there. The bwd kernel's
VMEM stack scales with the block (18 MB at 8x192, cap raised to 100 MB), so
16 should fit; 32 likely dies like the eval kernel's 6144-pt block did.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 580 python tools/perf_train_block_sweep.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.ops.pallas import fused_render as fr
from nerfsos_tpu.models.nerf import NeRFConfig


def log(*a):
    print(*a, file=sys.stderr, flush=True)


S = int(sys.argv[1]) if len(sys.argv) > 1 else 192
BLOCKS = [int(b) for b in sys.argv[2:]] or [8, 16, 24]
R = 32768 if S == 64 else 16384  # SOS coarse shape vs RGB fine shape
cfg = NeRFConfig(
    n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
    compute_dtype="bfloat16", fused_field=True,
)

from nerfsos_tpu.models.nerf import NeRFNet
net = NeRFNet(cfg)
params = net.init(jax.random.PRNGKey(0))["fine"]
odv = jax.random.normal(jax.random.PRNGKey(1), (R, 9))
z = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (R, S)) * 13 + 1.2, axis=-1)


def loss(p, odv, z):
    maps, w = fr.fused_train_render_planar(p, odv, z, cfg)
    return jnp.sum(maps) + jnp.sum(w)


for blk in BLOCKS:
    fr.TRAIN_RAY_BLOCK = blk
    try:
        f = jax.jit(lambda p, o, zz: loss(p, o, zz))
        dt_f = bench.time_fn(f, params, odv, z, iters=4)
        g = jax.jit(jax.grad(loss))
        dt_g = bench.time_fn(
            lambda p, o, zz: g(p, o, zz)["mlp"]["rgb_linear"]["kernel"],
            params, odv, z, iters=4)
        log(f"blk={blk}: fwd {dt_f*1e3:.1f} ms, fwd+bwd {dt_g*1e3:.1f} ms "
            f"({R/dt_g:,.0f} rays/s fine-only)")
    except Exception:
        log(f"blk={blk}: FAILED\n{traceback.format_exc(limit=3)}")
fr.TRAIN_RAY_BLOCK = None
