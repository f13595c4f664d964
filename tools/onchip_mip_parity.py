"""On-chip parity for the fused mip TRAIN kernel, measured the way the CPU
test measures it (tests/test_mip.py::test_mip_planar_grads_match_xla):
per-leaf max|a-b|/max|a| — the per-element rel metric of onchip_r4.py's
first pass reports pure conditioning noise on near-zero entries.

Caveats of the on-chip reference (CLAUDE.md): the XLA path's matmuls run at
TPU default precision (bf16 rounding) even with f32 params, and both passes
share the importance CDF, so isolated bin-flip outliers are expected by
construction. Forward rgb/rgb0 are compared first: if forward parity is at
bf16 level, grad discrepancies beyond it are reference-rounding + CDF, not
kernel bugs (kernel logic is pinned exactly by the CPU interpret test).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/onchip_mip_parity.py
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.mip import MipNeRFNet  # noqa: E402
from nerfsos_tpu.models.nerf import NeRFConfig  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    log(f"backend: {jax.default_backend()}")
    cfg = NeRFConfig(n_samples=16, n_importance=32, multires=10,
                     multires_views=4, ray_block=256, remat=False,
                     compute_dtype="float32", fused_field=False)
    net = MipNeRFNet(cfg)
    pl_net = MipNeRFNet(dataclasses.replace(cfg, fused_field=True))
    params = net.init(jax.random.PRNGKey(0))
    rays = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 3))
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (256, 3))

    def fwd(n, p):
        return n(p, rays, (1.0, 4.0), 0.001, key=jax.random.PRNGKey(2),
                 train=True, perturb=0.0)

    oa = jax.jit(lambda p: fwd(net, p))(params)
    ob = jax.jit(lambda p: fwd(pl_net, p))(params)
    for k in ("rgb0", "rgb"):
        a, b = np.asarray(oa[k], np.float64), np.asarray(ob[k], np.float64)
        d = np.abs(a - b)
        log(f"[fwd {k}] max abs {d.max():.2e} p50 {np.median(d):.2e}")

    def loss(n, p):
        out = fwd(n, p)
        return (jnp.mean((out["rgb"] - tgt) ** 2)
                + jnp.mean((out["rgb0"] - tgt) ** 2))

    ga = jax.jit(jax.grad(lambda p: loss(net, p)))(params)
    gb = jax.jit(jax.grad(lambda p: loss(pl_net, p)))(params)
    worst, names = 0.0, []
    for (path, a), (_, b) in zip(jax.tree_util.tree_flatten_with_path(ga)[0],
                                 jax.tree_util.tree_flatten_with_path(gb)[0]):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        r = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        names.append((r, jax.tree_util.keystr(path)))
        worst = max(worst, r)
    names.sort(reverse=True)
    for r, n in names[:6]:
        log(f"[grad leaf] {r:.2e}  {n}")
    # default-precision XLA reference: bf16-level (~1e-2) per-leaf agreement
    # is the expected bound; the CPU interpret test pins exactness at 3e-5
    ok = worst < 3e-2
    log(f"[mip-train parity] worst per-leaf {worst:.2e} "
        f"{'PASS' if ok else 'FAIL'} (bound 3e-2, on-chip default-precision "
        f"reference)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
