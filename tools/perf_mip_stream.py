"""VERDICT r4 #4: measure the mip-eval streamed-Gaussian counter-hypothesis.

The mip eval kernel's padded util (0.755, BENCH_r04) trails classic eval
(0.883); ROUND4_NOTES #4 blames the in-kernel VPU prologue (conical-frustum
Gaussian + IPE build). The untested counter-move: let XLA precompute the
Gaussian (mean3, cov3, mids, D) and stream it as one perfectly-tiled
[8, N] f32 operand (_MIP_GAUSS_MODE="stream") — ~32 B/pt of HBM traffic for
the prologue time.

Same-session on-chip protocol (the only comparison the tunnel's variance
band allows):
  1. parity: kernel vs stream full-render outputs (deterministic eval),
  2. ABAB timing at the bench shape (16384 rays, 64+128),
  3. block re-sweep for stream mode (its VMEM residency is lower; the 1536
     optimum was measured for the in-kernel build).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 3000 \
       python tools/perf_mip_stream.py 2>&1 | tee /tmp/mip_stream.log
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench

from nerfsos_tpu.models.mip import MipNeRFNet
from nerfsos_tpu.models.nerf import NeRFConfig
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 16384
RESULTS = {}


def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    cfg = NeRFConfig(
        n_samples=64, n_importance=128, multires=10, multires_views=4,
        ray_block=N, remat=False, compute_dtype="bfloat16", fused_field=True,
    )
    net = MipNeRFNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(1), (2, N, 3))

    def render(p, r):
        return net(p, r, (1.2, 14.72), 0.001, train=False)

    MODES = ("kernel", "stream", "ipe")
    outs = {}
    times = {}
    try:
        for mode in MODES:
            fr._MIP_GAUSS_MODE = mode
            f = jax.jit(lambda p, r: render(p, r)["rgb"])
            outs[mode] = np.array(jax.block_until_ready(f(params, rays)))
            times[mode] = [bench.time_fn(f, params, rays)]
        for mode in MODES[1:]:
            d = np.abs(outs["kernel"] - outs[mode])
            RESULTS[f"parity_max_{mode}"] = float(d.max())
            RESULTS[f"parity_p50_{mode}"] = float(np.percentile(d, 50))
            log(f"[parity] {mode}: rgb max|k-x| {d.max():.3e} "
                f"p50 {np.percentile(d, 50):.3e} "
                f"bitequal={bool((d == 0).all())}")
        # ABAB second round
        for mode in MODES:
            fr._MIP_GAUSS_MODE = mode
            f = jax.jit(lambda p, r: render(p, r)["rgb"])
            times[mode].append(bench.time_fn(f, params, rays))
        for mode in MODES:
            t = min(times[mode])
            RESULTS[f"{mode}_ms"] = t * 1e3
            RESULTS[f"{mode}_rps"] = N / t
            log(f"[AB] {mode}: {t*1e3:.1f} ms = {N/t:,.0f} rays/s "
                f"({'/'.join(f'{x*1e3:.1f}' for x in times[mode])})")
    except Exception:
        log("[AB] FAILED:\n" + traceback.format_exc())
        RESULTS["ab_error"] = traceback.format_exc(limit=2)

    # block sweep under streaming (VMEM residency changed; 1536 was measured
    # for the in-kernel build — round-5 finding: "stream" at 4608 == kernel
    # floor, so sweep the ipe arm the same way)
    for mode in ("stream", "ipe"):
        try:
            fr._MIP_GAUSS_MODE = mode
            sweep = {}
            for tgt in (1536, 2048, 3072, 4608, 6144):
                fr._MIP_TARGET_N = tgt
                try:
                    f = jax.jit(lambda p, r: render(p, r)["rgb"])
                    t = bench.time_fn(f, params, rays)
                    sweep[tgt] = t * 1e3
                    log(f"[sweep] {mode} target_n={tgt}: {t*1e3:.1f} ms "
                        f"= {N/t:,.0f} rays/s")
                except Exception as e:
                    sweep[tgt] = None
                    log(f"[sweep] {mode} target_n={tgt}: FAILED "
                        f"({type(e).__name__}: {str(e)[:200]})")
            RESULTS[f"{mode}_block_sweep_ms"] = sweep
        except Exception:
            log(f"[sweep {mode}] FAILED:\n" + traceback.format_exc())
        finally:
            fr._MIP_TARGET_N = 1536
            fr._MIP_GAUSS_MODE = "kernel"

    print(json.dumps(RESULTS, indent=1))


if __name__ == "__main__":
    main()
