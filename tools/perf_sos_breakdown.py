"""Where does the SOS step's non-field time go? (geo/app correlation losses,
DINO, patches) — decides whether a blockwise Pallas correlation kernel is
worth building (the geo loss materializes [B,P,P,P,P] fd/cd tensors:
8 x 64^4 fp32 = 537 MB each, pure HBM traffic).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_sos_breakdown.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from nerfsos_tpu.losses.correlation import (
    CorrelationLoss,
    GeoCorrelationLoss,
    get_similarity_matrix,
)

B, P, SEM, FC, FS = 8, 64, 2, 384, 14  # batch, patch, sem_dim, DINO C, feat side


def log(*a):
    print(*a, file=sys.stderr, flush=True)


ks = jax.random.split(jax.random.PRNGKey(0), 8)
sem = jax.random.normal(ks[0], (B, SEM, P, P))
depth = jax.random.uniform(ks[1], (B, 1, P, P)) * 5 + 1
ray_o = jax.random.normal(ks[2], (B, 3, P, P))
ray_d = jax.random.normal(ks[3], (B, 3, P, P))
feat = jax.random.normal(ks[4], (B, FC, FS, FS))
cls_ = jax.random.normal(ks[5], (B, FC))
sim = get_similarity_matrix(cls_)

app = CorrelationLoss.from_params([0.18, 1, 0.46, 1], use_sim_matrix=True)
geo = GeoCorrelationLoss.from_params([0.5, 1, 3, 1], use_sim_matrix=True)


def time_grad(name, fn, *args):
    g = jax.jit(jax.grad(fn))
    dt = bench.time_fn(g, *args, iters=4)
    log(f"{name}: {dt*1e3:.1f} ms")
    return dt


# geo loss: grad wrt sem (the only differentiable input — fd is stop-grad)
def geo_loss_fn(s):
    return geo(ks[6], depth, s, (ray_o, ray_d), sim)


def app_loss_fn(s):
    return app(ks[7], feat, s, sim)


t_geo = time_grad("geo corr (1 call, fwd+bwd wrt sem)", geo_loss_fn, sem)
t_app = time_grad("app corr (1 call, fwd+bwd wrt sem)", app_loss_fn, sem)
log(f"SOS uses 2 geo + 2 app calls: {2*(t_geo+t_app)*1e3:.1f} ms of the step")

# geo forward alone (no grad) for reference
dt = bench.time_fn(jax.jit(geo_loss_fn), sem, iters=4)
log(f"geo corr fwd only: {dt*1e3:.1f} ms")
