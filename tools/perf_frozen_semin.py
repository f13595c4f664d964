"""Round-5 frozen-backward v3 A/B: stream h (v2) vs stream the full sem_in.

The v2 (stream_h) trace put the frozen bwd kernels at 26.2 ms — the h/dmaps
stream floor (~10-15 ms) plus a "PE/dmaps prologue": with sem_with_coord the
bwd still broadcasts the ray geometry (od6), relayouts z, and rebuilds the
63-row points PE in kernel just to reassemble sem_in = [h; emb]. v3
(stream_semin) has the FORWARD store sem_in whole: the bwd's prologue
reduces to the sem-map cotangent broadcast, for +emb_rows*2 B/pt of stream
(~0.8 GB fine at the flagship shape).

Same-session protocol: parity (post-update params bit-equal vs stream_h)
then ABAB best-of-2x4.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
       python tools/perf_frozen_semin.py 2>&1 | tee /tmp/frozen_semin.log
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

    steps, out_states = {}, {}
    try:
        for mode in ("stream_h", "stream_semin"):
            fr._FROZEN_BWD_MODE = mode
            steps[mode] = make_sos_train_step(net, ext, app, geo, sos_cfg,
                                              1.2, 14.72, donate=False)
            s, m = steps[mode](state, dino_params, batch, key)
            jax.block_until_ready(s)
            out_states[mode] = (s, float(m["loss"]))
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(out_states["stream_h"][0].params),
                        jax.tree_util.tree_leaves(out_states["stream_semin"][0].params)):
            worst = max(worst, float(jnp.max(jnp.abs(a - b))))
        RESULTS["param_maxdiff"] = worst
        log(f"[parity] post-update param max|h-semin| = {worst:.3e} "
            f"(loss {out_states['stream_h'][1]:.6f} / "
            f"{out_states['stream_semin'][1]:.6f})")

        def once(mode):
            new_s, _ = steps[mode](state, dino_params, batch, key)
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
        log("[AB] FAILED:\n" + traceback.format_exc())
        RESULTS["error"] = traceback.format_exc(limit=2)
    finally:
        fr._FROZEN_BWD_MODE = "stream_semin"

    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
