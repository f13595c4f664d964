"""On-chip _FLASH_BI sweep with the raised VMEM cap (flash_corr.py
_COMPILER_PARAMS; session-3 found 256/512 failed at runtime under the default
16 MB scoped stack — same root cause as the fused_render f32 overflow).

Per bi in (128, 256, 512): paired geo value+grad parity vs the bi=128 result
(changed row-block size only reorders the tile accumulation — expect ~1e-6),
then fwd+bwd timing. Finishes with the full SOS step at the fastest bi.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_flash_bi.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.losses.correlation import GeoCorrelationLoss, get_similarity_matrix
from nerfsos_tpu.ops.pallas import flash_corr as fc


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ks = jax.random.split(jax.random.PRNGKey(0), 8)
B, P, S = 8, 64, 2
sem0 = jax.random.normal(ks[0], (B, S, P, P))
sem1 = jax.random.normal(ks[7], (B, S, P, P))
depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
ray_o = jax.random.normal(ks[2], (B, 3, P, P))
ray_d = jax.random.normal(ks[3], (B, 3, P, P))
sim = get_similarity_matrix(jax.random.normal(ks[4], (B, 384)))

geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)


def paired(s0, s1):
    return geo.pair(ks[5], ks[6], depth, s0, s1, (ray_o, ray_d), sim)


def wsum(s0, s1):
    return sum(x * w for x, w in zip(paired(s0, s1), (1.3, 0.7)))


results = {}
ref_v = ref_g = None
for bi in (128, 256, 512):
    fc._FLASH_BI = bi
    try:
        v = jax.jit(paired)(sem0, sem1)
        _gf = jax.jit(jax.grad(wsum, argnums=(0, 1)))
        g = _gf(sem0, sem1)
        v = (float(v[0]), float(v[1]))
        gn = [np.asarray(x) for x in g]
        if bi == 128:
            ref_v, ref_g = v, gn
            log(f"bi=128 values {v[0]:.6f} / {v[1]:.6f} (reference)")
        else:
            rv = max(abs(v[0] - ref_v[0]) / abs(ref_v[0]),
                     abs(v[1] - ref_v[1]) / abs(ref_v[1]))
            rg = max(float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
                     for a, b in zip(gn, ref_g))
            log(f"bi={bi} vs 128: value rel {rv:.2e}, grad rel {rg:.2e}")
            assert rv < 1e-5 and rg < 1e-4, f"PARITY FAIL at bi={bi}"
        tg = lambda a, b: sum(jnp.sum(x) for x in _gf(a, b))
        dt = bench.time_fn(tg, sem0, sem1, iters=6)
        log(f"paired geo fwd+bwd [bi={bi}]: {dt*1e3:.2f} ms")
        results[bi] = dt
    except Exception as e:
        log(f"bi={bi}: FAILED {type(e).__name__}: {e}")
        if bi == 128:
            sys.exit("bi=128 (the parity reference) failed — aborting sweep")

if not results:
    sys.exit("all bi failed — nothing to compare")
best = min(results, key=results.get)
log(f"best bi = {best} ({results[best]*1e3:.2f} ms); SOS step at best:")
fc._FLASH_BI = best
rps = bench.bench_sos()
log(f"sos step [bi={best}]: {rps:,.0f} rays/s")
if best != 128:
    fc._FLASH_BI = 128
    rps128 = bench.bench_sos()
    log(f"sos step [bi=128]: {rps128:,.0f} rays/s")
