"""Round-5: TRAIN_RAY_BLOCK re-sweep under the frozen v3 composition.

The 1024-pt train block target dates from the round-3 sweep of the FULL
backward (every layer's dW accumulator resident in VMEM). The frozen v3
step is a different kernel mix: the fwd stores a 319-row sem_in residual
(more VMEM + an extra output stream per block) and the bwd holds only the
two sem-head weight pairs — neither side has been swept since. Sweep the
shared ray block on the flagship SOS step (stream_semin default).

Per-config ABAB (two groups of 4, best), flagship 32768 rays.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 5000 \
       python tools/perf_frozen_blk.py 2>&1 | tee /tmp/frozen_blk.log
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench

from nerfsos_tpu.engines.sos import SOSConfig, make_sos_train_step
from nerfsos_tpu.engines.state import TrainState, make_optimizer
from nerfsos_tpu.losses.correlation import CorrelationLoss, GeoCorrelationLoss
from nerfsos_tpu.models.extractor import VitExtractor
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, P, STRIDE = 8, 64, 6
N = B * P * P
# None = per-pass default (fine 8 rays x 192, coarse 16 x 64); integers force
# the SAME rays/block on both passes.
CONFIGS = (None, 16, 32)
RESULTS = {}


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=STRIDE,
                        fix_backbone=True)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    state = TrainState.create(
        params, make_optimizer(5e-4, fix_backbone=True, params=params))
    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    batch = {"rays": rays, "target": jnp.zeros((N, 3)),
             "masks": jnp.zeros((N, 1))}
    key = jax.random.PRNGKey(3)

    steps = {}
    try:
        for rb in CONFIGS:
            name = "default" if rb is None else f"rb{rb}"
            fr.TRAIN_RAY_BLOCK = rb
            try:
                step = make_sos_train_step(net, ext, app, geo, sos_cfg,
                                           1.2, 14.72, donate=False)
                s, m = step(state, dino_params, batch, key)
                jax.block_until_ready(s)
                steps[name] = step
                log(f"[compile] {name}: ok (loss {float(m['loss']):.6f})")
            except Exception as e:
                log(f"[compile] {name}: FAIL {str(e)[:200]}")
                RESULTS[f"{name}_error"] = str(e)[:200]

        def once(name):
            new_s, _ = steps[name](state, dino_params, batch, key)
            return bench._touch_params(new_s.params)

        t = {m: [bench.time_fn(once, m, iters=4)] for m in steps}
        for m in steps:
            t[m].append(bench.time_fn(once, m, iters=4))
        for m in steps:
            best = min(t[m])
            RESULTS[f"{m}_ms"] = best * 1e3
            RESULTS[f"{m}_rps"] = N / best
            log(f"[AB] {m}: {best*1e3:.1f} ms = {N/best:,.0f} rays/s "
                f"({'/'.join(f'{x*1e3:.1f}' for x in t[m])})")
    except Exception:
        log("[sweep] FAILED:\n" + traceback.format_exc())
        RESULTS["error"] = traceback.format_exc(limit=2)
    finally:
        fr.TRAIN_RAY_BLOCK = None

    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
