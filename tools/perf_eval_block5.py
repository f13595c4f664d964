"""Round-5 eval-render block probe past the round-3 sweep's 262144 ceiling.

tools/perf_sos_v2.py's [EVAL] arm accidentally measured the FULL-parity
render (coarse_outputs defaults True) and found 524288 rays/call +0.6% over
262144 same-session. This measures the HEADLINE path (coarse_outputs=False,
bench.py bench_render's eval arm) at 262144 / 524288 / 1048576 rays/call,
ABAB. If the +0.6% holds for eval, bench.py's N_RAYS_RENDER moves to the
winner (rays are view-independent — a video render dispatches two 512x512
frames per call).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
       python tools/perf_eval_block5.py 2>&1 | tee /tmp/eval_block5.log
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench

from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet

def log(*a):
    print(*a, file=sys.stderr, flush=True)

RESULTS = {}

def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    renders, states = {}, {}
    for n in (262144, 524288, 1048576):
        try:
            cfg = NeRFConfig(
                n_samples=64, n_importance=128, use_semantics=True,
                sem_with_coord=True, ray_block=n, remat=False,
                compute_dtype="bfloat16", fused_field=True,
            )
            net = NeRFNet(cfg)
            p = net.init(jax.random.PRNGKey(0))
            r = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
            fn = jax.jit(lambda pp, rr, _net=net: _net(
                pp, rr, (1.2, 14.72), train=False, coarse_outputs=False)["rgb"])
            float(jnp.sum(fn(p, r)))  # compile + warm
            renders[n], states[n] = fn, (p, r)
        except Exception:
            log(f"[EVAL] block {n} FAILED:\n" + traceback.format_exc(limit=3))
            RESULTS[f"eval_{n}_error"] = traceback.format_exc(limit=2)

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
    print(json.dumps(RESULTS, indent=1))

if __name__ == "__main__":
    main()
