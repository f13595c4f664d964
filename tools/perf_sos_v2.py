"""Round-5 follow-up batch: measured trace of the stream_h SOS step + one
eval-render block probe.

  [PROF]  The ROUND5_NOTES #6 table was traced on v1 (recompute, 188 ms) and
          v2's composition was estimated from deltas; this traces the actual
          shipping default (_FROZEN_BWD_MODE="stream_h", 140 ms) so the notes
          carry a measured breakdown of what ships.
  [EVAL]  The round-3 eval block sweep stopped at 262144 rays/call
          (65536/131072/262144 = 409.0/416.7/422.5k rays/s, diminishing);
          one more doubling (524288 = two 512x512 images/call) ABAB vs
          262144 checks whether the headline has a last ~1% of
          dispatch/tail amortization left.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
       python tools/perf_sos_v2.py 2>&1 | tee /tmp/sos_v2.log
"""
import json
import sys
import tempfile
import traceback

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

B, P, STRIDE = 8, 64, 6
N = B * P * P
RESULTS = {}

def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    # ---------------- [PROF] ----------------------------------------------
    try:
        cfg = NeRFConfig(
            n_samples=64, n_importance=128, use_semantics=True,
            sem_with_coord=True, ray_block=N, remat=False,
            compute_dtype="bfloat16", fused_field=True,
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
        step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72,
                                   donate=False)
        rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
        batch = {"rays": rays, "target": jnp.zeros((N, 3)),
                 "masks": jnp.zeros((N, 1))}
        key = jax.random.PRNGKey(3)

        def once():
            new_s, _ = step(state, dino_params, batch, key)
            return bench._touch_params(new_s.params)

        float(once())  # compile + warm
        dt = bench.time_fn(once, iters=4)
        RESULTS["sos_ms"] = dt * 1e3
        log(f"[PROF] stream_h step: {dt*1e3:.1f} ms = {N/dt:,.0f} rays/s")
        td = tempfile.mkdtemp(prefix="sosv2trace_")
        with jax.profiler.trace(td):
            for _ in range(2):
                float(once())
        log(f"[PROF] trace of the stream_h step ({td}):")
        parse_trace(td, top=28)
    except Exception:
        log("[PROF] FAILED:\n" + traceback.format_exc())
        RESULTS["prof_error"] = traceback.format_exc(limit=2)

    # ---------------- [EVAL] ----------------------------------------------
    try:
        renders, states = {}, {}
        for n in (262144, 524288):
            rcfg = NeRFConfig(
                n_samples=64, n_importance=128, use_semantics=True,
                sem_with_coord=True, ray_block=n, remat=False,
                compute_dtype="bfloat16", fused_field=True,
            )
            rnet = NeRFNet(rcfg)
            rp = rnet.init(jax.random.PRNGKey(0))
            rr = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
            renders[n] = jax.jit(
                lambda p, r, _net=rnet: _net(p, r, (1.2, 14.72),
                                             train=False)["rgb"])
            states[n] = (rp, rr)
            float(jnp.sum(renders[n](rp, rr)))  # compile + warm

        t = {n: [bench.time_fn(lambda nn=n: renders[nn](*states[nn]), iters=3)]
             for n in renders}
        for n in renders:  # ABAB second pass
            t[n].append(bench.time_fn(lambda nn=n: renders[nn](*states[nn]),
                                      iters=3))
        for n in renders:
            best = min(t[n])
            RESULTS[f"eval_{n}_ms"] = best * 1e3
            RESULTS[f"eval_{n}_rps"] = n / best
            log(f"[EVAL] block {n}: {best*1e3:.1f} ms = {n/best:,.0f} rays/s "
                f"({'/'.join(f'{x*1e3:.1f}' for x in t[n])})")
    except Exception:
        log("[EVAL] FAILED:\n" + traceback.format_exc())
        RESULTS["eval_error"] = traceback.format_exc(limit=2)

    print(json.dumps(RESULTS, indent=1))

if __name__ == "__main__":
    main()
