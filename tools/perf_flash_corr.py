"""On-chip check + perf for the flash geo-correlation kernel.

1. Parity at the flagship shape (B=8, P=64) vs the CPU interpret-mode golden
   (value + code gradients) — the round-1 rule: interpret tests can't catch
   on-chip bugs.
2. Timing vs the XLA path (31.6 ms/call measured in perf_sos_breakdown.py).
3. Full SOS step bench with the flash loss in place.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_flash_corr.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.losses.correlation import GeoCorrelationLoss, get_similarity_matrix


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ks = jax.random.split(jax.random.PRNGKey(0), 8)
B, P, S = 8, 64, 2
sem = jax.random.normal(ks[0], (B, S, P, P))
depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
ray_o = jax.random.normal(ks[2], (B, 3, P, P))
ray_d = jax.random.normal(ks[3], (B, 3, P, P))
sim = get_similarity_matrix(jax.random.normal(ks[4], (B, 384)))

flash = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)
xla = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True,
                                     use_flash=False)


def loss_fn(geo):
    def f(s):
        return geo(ks[5], depth, s, (ray_o, ray_d), sim)
    return f


# ---- on-chip parity (B=2 keeps the goldens tractable; N=4096 still
# exercises the real 512-block tiling).
# Value golden: numpy float64 transcription (a CPU f32 XLA golden is itself
# ~1e-3 off f64 here — sequential 16.7M-element f32 reductions drift; both
# on-chip paths tree-reduce and sit at ~1e-7 of f64).
# Grad check: on-chip flash vs on-chip XLA (torch-verified path). ------------
import numpy as np


def small(x):
    return x[:2]


def loss_small(geo):
    def f(s):
        return geo(ks[5], small(depth), s, (small(ray_o), small(ray_d)),
                   sim[:2, :2])
    return f


v_chip, g_chip = jax.jit(jax.value_and_grad(loss_small(flash)))(small(sem))
v_ref, g_ref = jax.jit(jax.value_and_grad(loss_small(xla)))(small(sem))

dn = np.asarray(jax.device_get(small(depth)), np.float64)
on = np.asarray(jax.device_get(small(ray_o)), np.float64)
ddn = np.asarray(jax.device_get(small(ray_d)), np.float64)
cn = np.asarray(jax.device_get(small(sem)), np.float64)
simn = np.asarray(jax.device_get(sim[:2, :2]), np.float64)
maxd = flash.max_depth
under = np.where(dn < maxd, dn, -np.inf)
dn = np.where(dn > maxd, under.max(), dn)
pts = on + ddn * dn
N = P * P


def kern(a, b):
    r = np.abs(a[:, :, :, None] - b[:, :, None, :]).sum(1)
    return np.minimum(1.0 / (r + 5e-2), maxd)


def nrm(x):
    n = np.sqrt(np.maximum((x * x).sum(1, keepdims=True), 1e-20))
    return x / n


def helper_mean64(f1, f2, c1, c2, shift):
    fd = kern(f1, f2)
    fd2 = fd - fd.mean(-1, keepdims=True) + fd.mean()
    cd = kern(nrm(c1), nrm(c2))
    return (-np.maximum(cd, 0) * (fd2 - shift)).mean()


fv = pts.reshape(2, 3, N)
cv = cn.reshape(2, S, N)
neg = np.argmin(simn, 0)
v64 = (flash.neg_weight * helper_mean64(fv, fv[neg], cv, cv[neg], flash.neg_shift)
       + flash.self_weight * helper_mean64(fv, fv, cv, cv, flash.self_shift))

rel_v = abs(float(v_chip) - v64) / abs(v64)
rel_vx = abs(float(v_ref) - v64) / abs(v64)
rel_g = float(np.linalg.norm(np.asarray(g_chip) - np.asarray(g_ref))
              / (np.linalg.norm(np.asarray(g_ref)) + 1e-12))
log(f"on-chip flash vs f64 golden: value rel {rel_v:.2e} "
    f"(on-chip XLA: {rel_vx:.2e}); flash-vs-XLA grad rel {rel_g:.2e}")
assert rel_v < 1e-5 and rel_g < 1e-4, "ON-CHIP PARITY FAIL"

# ---- timing ---------------------------------------------------------------
for name, geo in (("flash", flash), ("xla", xla)):
    g = jax.jit(jax.grad(loss_fn(geo)))
    dt = bench.time_fn(g, sem, iters=4)
    log(f"geo corr fwd+bwd [{name}]: {dt*1e3:.1f} ms")

# ---- paired path: on-chip parity + timing + _FLASH_BI sweep ---------------
from nerfsos_tpu.ops.pallas import flash_corr as fc


def two_calls(s0, s1):
    return (flash(ks[5], depth, s0, (ray_o, ray_d), sim),
            flash(ks[6], depth, s1, (ray_o, ray_d), sim))


def paired(s0, s1):
    return flash.pair(ks[5], ks[6], depth, s0, s1, (ray_o, ray_d), sim)


sem1 = jax.random.normal(ks[7], (B, S, P, P))
(t0, t1) = jax.jit(two_calls)(sem, sem1)
(p0, p1) = jax.jit(paired)(sem, sem1)
rel0 = abs(float(p0) - float(t0)) / (abs(float(t0)) + 1e-12)
rel1 = abs(float(p1) - float(t1)) / (abs(float(t1)) + 1e-12)
log(f"on-chip paired vs two singles: rel {rel0:.2e} / {rel1:.2e}")
assert rel0 < 1e-6 and rel1 < 1e-6, "ON-CHIP PAIR PARITY FAIL"

wsum = lambda f: (lambda s0, s1: sum(x * w for x, w in zip(f(s0, s1), (1.3, 0.7))))
gt = jax.jit(jax.grad(wsum(two_calls), argnums=(0, 1)))(sem, sem1)
gp = jax.jit(jax.grad(wsum(paired), argnums=(0, 1)))(sem, sem1)
for a, b in zip(gt, gp):
    r = float(np.linalg.norm(np.asarray(a) - np.asarray(b))
              / (np.linalg.norm(np.asarray(a)) + 1e-12))
    log(f"  paired grad rel {r:.2e}")
    assert r < 1e-4, "ON-CHIP PAIR GRAD FAIL"

_default_bi = fc._FLASH_BI
for bi in (128, 256, 512):
    fc._FLASH_BI = bi
    try:
        _g2 = jax.jit(jax.grad(wsum(paired), argnums=(0, 1)))
        g2 = lambda a, b: sum(jnp.sum(x) for x in _g2(a, b))
        dt = bench.time_fn(g2, sem, sem1, iters=4)
        log(f"paired geo fwd+bwd [_FLASH_BI={bi}]: {dt*1e3:.1f} ms "
            f"(vs two singles at 128: see above x2)")
    except Exception as e:
        log(f"paired geo [_FLASH_BI={bi}]: FAILED {type(e).__name__}")
fc._FLASH_BI = _default_bi

# ---- full SOS step --------------------------------------------------------
sos_rps = bench.bench_sos()
log(f"sos step with flash geo: {sos_rps:,.0f} rays/s")
