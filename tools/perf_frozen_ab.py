"""Round-5 on-chip batch: frozen-backbone SOS A/B + profile + shard_map smoke.

Three VERDICT r4 items in one TPU session (compiles are remote and slow; batch
them — CLAUDE.md):

  [AB]    #1 — same-session A/B of the flagship SOS step:
            A = round-4 production (full trunk fused VJP, optimizer zeroes
                frozen updates: SOSConfig(fix_backbone=False) +
                make_optimizer(fix_backbone=True)),
            B = frozen-backbone semantics (reference run_nerf.py:307-318:
                requires_grad=False never builds the trunk backward —
                SOSConfig(fix_backbone=True) routes the fused VJP through
                _train_frozen_bwd_kernel, sem-head dW/db only).
          Parity gate: post-update params bit-equal (grads for the sem head
          are bit-identical by construction; everything else is zeroed by
          multi_transform either way).
  [PROF]  #6 — device-op breakdown of the NEW step (fields vs corr tail vs
          DINO) so round 6 knows what is left.
  [SMOKE] #3 — the shard_map production program (fused planar field + flash
          geo + explicit collectives) compiled + stepped through the REAL
          Mosaic toolchain on a 1-device mesh, with parity vs the unsharded
          step. Every Mosaic surprise so far (regalloc RET_CHECK, VMEM caps,
          silent dot miscompile) was invisible in CPU interpret mode.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 \
       python tools/perf_frozen_ab.py 2>&1 | tee /tmp/frozen_ab.log
"""
import json
import sys
import tempfile
import traceback

import jax
import jax.numpy as jnp
import numpy as np

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


def build(fix_in_loss: bool):
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, use_semantics=True, sem_with_coord=True,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = NeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    ext = VitExtractor("dino_vits16", dtype=jnp.bfloat16)
    dino_params = ext.init(jax.random.PRNGKey(1))
    sos_cfg = SOSConfig(batch_size=B, patch_size=P, patch_stride=STRIDE,
                        fix_backbone=fix_in_loss)
    app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
    geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
    state = TrainState.create(
        params, make_optimizer(5e-4, fix_backbone=True, params=params))
    step = make_sos_train_step(net, ext, app, geo, sos_cfg, 1.2, 14.72,
                               donate=False)
    return net, ext, app, geo, sos_cfg, state, dino_params, step


def batch_and_key():
    rays = jax.random.normal(jax.random.PRNGKey(2), (2, N, 3))
    batch = {"rays": rays, "target": jnp.zeros((N, 3)),
             "masks": jnp.zeros((N, 1))}
    return batch, jax.random.PRNGKey(3)


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    batch, key = batch_and_key()

    # ---------------- [AB] -------------------------------------------------
    netA = netB = None
    try:
        *_, stateA, dpA, stepA = build(fix_in_loss=False)
        netB, extB, appB, geoB, cfgB, stateB, dpB, stepB = build(fix_in_loss=True)

        # parity first (also warms both compiles)
        sA, mA = stepA(stateA, dpA, batch, key)
        sB, mB = stepB(stateB, dpB, batch, key)
        jax.block_until_ready((sA, sB))
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(sA.params),
                        jax.tree_util.tree_leaves(sB.params)):
            worst = max(worst, float(jnp.max(jnp.abs(a - b))))
        RESULTS["ab_param_maxdiff"] = worst
        RESULTS["ab_loss_A"] = float(mA["loss"])
        RESULTS["ab_loss_B"] = float(mB["loss"])
        log(f"[AB] post-update param max|A-B| = {worst:.3e} "
            f"(loss A {float(mA['loss']):.6f} B {float(mB['loss']):.6f})")

        def once(step, s, dp):
            new_s, _ = step(s, dp, batch, key)
            return bench._touch_params(new_s.params)

        # ABAB to cancel tunnel drift
        tA1 = bench.time_fn(once, stepA, stateA, dpA, iters=4)
        tB1 = bench.time_fn(once, stepB, stateB, dpB, iters=4)
        tA2 = bench.time_fn(once, stepA, stateA, dpA, iters=4)
        tB2 = bench.time_fn(once, stepB, stateB, dpB, iters=4)
        tA, tB = min(tA1, tA2), min(tB1, tB2)
        RESULTS.update(ab_ms_A=tA * 1e3, ab_ms_B=tB * 1e3,
                       ab_rps_A=N / tA, ab_rps_B=N / tB)
        log(f"[AB] A(full bwd) {tA*1e3:.1f} ms = {N/tA:,.0f} rays/s   "
            f"({tA1*1e3:.1f}/{tA2*1e3:.1f})")
        log(f"[AB] B(frozen)   {tB*1e3:.1f} ms = {N/tB:,.0f} rays/s   "
            f"({tB1*1e3:.1f}/{tB2*1e3:.1f})")
    except Exception:
        log("[AB] FAILED:\n" + traceback.format_exc())
        RESULTS["ab_error"] = traceback.format_exc(limit=2)

    # ---------------- [PROF] ----------------------------------------------
    try:
        if netB is not None:
            def prof_once():
                new_s, _ = stepB(stateB, dpB, batch, key)
                return bench._touch_params(new_s.params)

            td = tempfile.mkdtemp(prefix="frozentrace_")
            with jax.profiler.trace(td):
                for _ in range(2):
                    float(prof_once())
            log(f"[PROF] trace of the frozen step ({td}):")
            parse_trace(td, top=24)
    except Exception:
        log("[PROF] FAILED:\n" + traceback.format_exc())

    # ---------------- [SMOKE] ---------------------------------------------
    try:
        from jax.sharding import Mesh

        if netB is None:
            netB, extB, appB, geoB, cfgB, stateB, dpB, stepB = build(True)
        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        step_sm = make_sos_train_step(netB, extB, appB, geoB, cfgB, 1.2, 14.72,
                                      mesh=mesh, donate=False, spmd="shard_map")
        s_sm, m_sm = step_sm(stateB, dpB, batch, key)
        jax.block_until_ready(s_sm)
        log("[SMOKE] shard_map SOS program compiled + stepped on the real chip")
        # parity vs the unsharded step (deterministic settings: perturb/noise
        # off by default, so the fold_in(shard) render key is moot)
        s_ref, m_ref = stepB(stateB, dpB, batch, key)
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(s_sm.params),
                        jax.tree_util.tree_leaves(s_ref.params)):
            worst = max(worst, float(jnp.max(jnp.abs(a - b))))
        RESULTS["smoke_param_maxdiff"] = worst
        RESULTS["smoke_loss_sm"] = float(m_sm["loss"])
        RESULTS["smoke_loss_ref"] = float(m_ref["loss"])
        log(f"[SMOKE] post-update param max|sm-ref| = {worst:.3e} "
            f"(loss sm {float(m_sm['loss']):.6f} ref {float(m_ref['loss']):.6f})")

        def sm_once(s, dp):
            new_s, _ = step_sm(s, dp, batch, key)
            return bench._touch_params(new_s.params)

        t_sm = bench.time_fn(sm_once, stateB, dpB, iters=4)
        RESULTS["smoke_ms"] = t_sm * 1e3
        log(f"[SMOKE] shard_map step {t_sm*1e3:.1f} ms = {N/t_sm:,.0f} rays/s "
            f"(1-device mesh; overhead vs unsharded "
            f"{(t_sm*1e3) - RESULTS.get('ab_ms_B', float('nan')):+.1f} ms)")
    except Exception:
        log("[SMOKE] FAILED:\n" + traceback.format_exc())
        RESULTS["smoke_error"] = traceback.format_exc(limit=2)

    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
