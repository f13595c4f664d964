"""Round-3 SOS step breakdown: profile the full flagship SOS train step
(8x64x64 patches, fused planar train kernels, both correlation losses, DINO)
and sum device-op time by kernel name — tells us where the 323 ms goes and
what stands between 101.4k and the VERDICT #4 target of 110k rays/s.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_sos_r3.py
"""
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from tools.perf_r3_baseline import parse_trace

from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
from nerfsos_tpu.engines.state import TrainState, make_optimizer
from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
from nerfsos_tpu.models.extractor import VitExtractor
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(bwd_block=768):
    B, P, stride = 8, 64, 6
    N = B * P * P
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
        field_bwd_block=bwd_block,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=stride)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    state = TrainState.create(params, make_optimizer(5e-4, fix_backbone=True, params=params))
    step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72, donate=False)

    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    batch = {"rays": rays, "target": jnp.zeros((N, 3)), "masks": jnp.zeros((N, 1))}

    def sos_once(s, dp, b, k):
        new_s, _ = step(s, dp, b, k)
        return new_s.params["coarse"]["mlp"]["sem_0"]["kernel"]

    dt = bench.time_fn(sos_once, state, dino_params, batch,
                       jax.random.PRNGKey(3), iters=4)
    log(f"sos step (bwd_block={bwd_block}): {dt*1e3:.1f} ms = {N/dt:,.0f} rays/s")

    td = tempfile.mkdtemp(prefix="sostrace_")
    with jax.profiler.trace(td):
        for _ in range(2):
            float(jnp.sum(sos_once(state, dino_params, batch, jax.random.PRNGKey(3))))
    parse_trace(td, top=24)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 768)
