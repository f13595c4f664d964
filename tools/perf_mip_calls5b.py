"""Extension of perf_mip_calls5: probe 262144 / 524288 / 1048576 rays/call
(262144 re-measured as the same-session anchor). First batch measured
16384 -> 65536 -> 262144 = 339.6k -> 396.7k -> 410.0k rays/s (+20.7%);
this finds the convergence point the classic eval block found at ~1M.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 4000 \
       python tools/perf_mip_calls5b.py 2>&1 | tee /tmp/mip_calls5c.log
"""
import json
import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench

from nerfsos_tpu.models.mip import MipNeRFNet
from nerfsos_tpu.models.nerf import NeRFConfig

def log(*a):
    print(*a, file=sys.stderr, flush=True)

RESULTS = {}

def main():
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    renders, states = {}, {}
    for n in (262144, 524288, 1048576):
        try:
            cfg = NeRFConfig(
                n_samples=64, n_importance=128, multires=10, multires_views=4,
                ray_block=n, remat=False, compute_dtype="bfloat16",
                fused_field=True,
            )
            net = MipNeRFNet(cfg)
            p = net.init(jax.random.PRNGKey(0))
            r = jax.random.normal(jax.random.PRNGKey(1), (2, n, 3))
            fn = jax.jit(lambda pp, rr, _net=net: _net(
                pp, rr, (1.2, 14.72), 0.001, train=False)["rgb"])
            float(jnp.sum(fn(p, r)))  # compile + warm
            renders[n], states[n] = fn, (p, r)
        except Exception:
            log(f"[MIP] block {n} FAILED:\n" + traceback.format_exc(limit=3))
            RESULTS[f"mip_{n}_error"] = traceback.format_exc(limit=2)

    t = {n: [bench.time_fn(lambda nn=n: renders[nn](*states[nn]), iters=3)]
         for n in renders}
    for n in renders:  # ABAB second pass
        t[n].append(bench.time_fn(lambda nn=n: renders[nn](*states[nn]),
                                  iters=3))
    for n in renders:
        best = min(t[n])
        RESULTS[f"mip_{n}_ms"] = best * 1e3
        RESULTS[f"mip_{n}_rps"] = n / best
        log(f"[MIP] {n} rays/call: {best*1e3:.1f} ms = {n/best:,.0f} rays/s "
            f"({t[n][0]*1e3:.1f}/{t[n][1]*1e3:.1f})")
    print(json.dumps(RESULTS, indent=1))

if __name__ == "__main__":
    main()
