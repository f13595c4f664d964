"""On-chip microbench: the 7 ms compositing tail (perf_render_breakdown E).

Suspect: ``jnp.cumprod``'s TPU lowering (quadratic reduce-window over the
sample axis). Variants measured on the flagship fine-pass shape
[16384, 192] (+ value parity vs a numpy float64 golden):

  A. current `volumetric_render` (jnp.cumprod)
  B. Hillis-Steele doubling scan (log-depth elementwise multiplies)
  C. log-space triangular matmul (MXU prefix-sum, precision=HIGHEST)
  D. A but without materializing the `weights` output (DCE probe)

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_composite.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.core import render

R, S = 16384, 192


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=8, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def cumprod_scan(x):
    """Hillis-Steele inclusive cumprod along the last axis (log-depth)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        x = x * jnp.concatenate(
            [jnp.ones_like(x[..., :k]), x[..., :-k]], axis=-1)
        k *= 2
    return x


def make_composite(cumprod_impl):
    def excl(alpha):
        shifted = jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10], -1)
        return cumprod_impl(shifted)

    def comp(raw, z_vals, rays_d):
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)
        weights = alpha * excl(alpha)
        rgb = jax.nn.sigmoid(raw[..., :3])
        rgb_map = jnp.sum(weights[..., None] * rgb, -2)
        depth = jnp.sum(weights * z_vals, -1, keepdims=True)
        acc = jnp.sum(weights, -1, keepdims=True)
        depth = jnp.where(acc <= 1e-10, 1e10, depth)
        sem = jnp.sum(weights[..., None] * raw[..., 4:], -2)
        return dict(rgb=rgb_map, depth=depth, acc=acc, weights=weights, sem=sem)

    return comp


def cumprod_matmul_fixed(x):
    n = x.shape[-1]
    # cumsum_i = sum_j L[i, j] log x_j with L[i, j] = 1 for j <= i ->
    # out[r, i] = sum_j logx[r, j] * U[j, i] with U upper-triangular ones.
    tri = jnp.triu(jnp.ones((n, n), jnp.float32))
    return jnp.exp(
        jax.lax.dot_general(jnp.log(x), tri, (((x.ndim - 1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST))


def main():
    log("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    raw = jax.random.normal(ks[0], (R, S, 6))
    z = jnp.sort(jax.random.uniform(ks[1], (R, S)) * 10 + 1.2, axis=-1)
    d = jax.random.normal(ks[2], (R, 3))

    # numpy f64 golden
    raw_n, z_n, d_n = (np.asarray(raw, np.float64), np.asarray(z, np.float64),
                       np.asarray(d, np.float64))
    dists = np.concatenate([z_n[..., 1:] - z_n[..., :-1],
                            np.full_like(z_n[..., :1], 1e10)], -1)
    dists *= np.linalg.norm(d_n, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-np.maximum(raw_n[..., 3], 0) * dists)
    T = np.cumprod(np.concatenate([np.ones_like(alpha[..., :1]),
                                   1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    w_g = alpha * T
    rgb_g = (w_g[..., None] / (1 + np.exp(-raw_n[..., :3]))).sum(-2)

    variants = {
        "A jnp.cumprod": make_composite(lambda x: jnp.cumprod(x, axis=-1)),
        "B doubling scan": make_composite(cumprod_scan),
        "C logspace matmul": make_composite(cumprod_matmul_fixed),
    }
    for name, comp in variants.items():
        f = jax.jit(lambda r_, z_, d_, c=comp: c(r_, z_, d_)["rgb"])
        fw = jax.jit(lambda r_, z_, d_, c=comp: c(r_, z_, d_))
        out = jax.device_get(fw(raw, z, d))
        err_w = np.abs(out["weights"] - w_g).max()
        err_rgb = np.abs(out["rgb"] - rgb_g).max()
        dt = time_fn(f, raw, z, d)
        log(f"{name}: {dt*1e3:6.2f} ms  max|dw|={err_w:.2e} max|drgb|={err_rgb:.2e}")

    # D: no weights output (is the weights materialization costly?)
    compA = variants["A jnp.cumprod"]
    fD = jax.jit(lambda r_, z_, d_: compA(r_, z_, d_)["rgb"]
                 + compA(r_, z_, d_)["sem"].sum(-1, keepdims=True) * 0)
    log(f"D rgb-only (A):   {time_fn(fD, raw, z, d)*1e3:6.2f} ms")

    # E: CHANNEL-FIRST raw [C, R, S] — no lane padding on any big tensor.
    # A [R, S, 6] f32 array tiles its last two dims to (8, 128): the 6-lane
    # channel dim pads to 128, a 21x HBM read amplification. [6, R, S] tiles
    # (R, S) exactly.
    raw_cf = jnp.asarray(np.moveaxis(np.asarray(raw), -1, 0))  # [6, R, S]

    def comp_cf(rcf, z_vals, rays_d):
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(rcf[3]) * dists)
        weights = alpha * jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alpha[..., :1]),
                             1.0 - alpha[..., :-1] + 1e-10], -1), axis=-1)
        rgb_map = jnp.stack(
            [jnp.sum(weights * jax.nn.sigmoid(rcf[c]), -1) for c in range(3)], -1)
        depth = jnp.sum(weights * z_vals, -1, keepdims=True)
        acc = jnp.sum(weights, -1, keepdims=True)
        depth = jnp.where(acc <= 1e-10, 1e10, depth)
        sem = jnp.stack([jnp.sum(weights * rcf[4 + c], -1) for c in range(2)], -1)
        return dict(rgb=rgb_map, depth=depth, acc=acc, weights=weights, sem=sem)

    fE = jax.jit(lambda r_, z_, d_: comp_cf(r_, z_, d_)["rgb"])
    outE = jax.device_get(jax.jit(comp_cf)(raw_cf, z, d))
    errE = np.abs(outE["rgb"] - rgb_g).max()
    log(f"E channel-first:  {time_fn(fE, raw_cf, z, d)*1e3:6.2f} ms  "
        f"max|drgb|={errE:.2e}")


if __name__ == "__main__":
    main()
