"""On-chip check + perf for the PLANAR fused field kernels.

1. Parity vs the row-major fused kernel (both on-chip, bf16) at N=8192.
2. Forward timing at the flagship fine-pass N=3.1M: planar [6,N] IO vs
   row-major [N,3]/[N,6] IO (the row-major operands tile to T(8,128) with a
   42.7x pad; planar streams are unpadded).
3. Backward (dW/db) timing, same shapes.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_planar.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet
from nerfsos_tpu.ops.pallas import fused_field as ff


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=6, warmup=2):
    def run(n):
        acc = 0.0
        for _ in range(n):
            acc = acc + jnp.sum(fn(*args))
        return float(acc)

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return (time.perf_counter() - t0) / iters


def main():
    log("backend:", jax.default_backend())
    cfg = NeRFConfig(use_semantics=True, sem_with_coord=True,
                     compute_dtype="bfloat16", fused_field=True)
    net = NeRFNet(cfg)
    params = {"mlp": net.init(jax.random.PRNGKey(0))["coarse"]["mlp"]}

    # ---- parity (on-chip, vs the row-major fused kernel) ----
    N = 8192
    k = jax.random.split(jax.random.PRNGKey(1), 3)
    pts = jax.random.normal(k[0], (N, 3))
    dirs = jax.random.normal(k[1], (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    pd = jnp.concatenate([pts.T, dirs.T], 0)

    rm = jax.jit(lambda p: ff.fused_field_apply(p, pts[:, None, :], dirs, cfg))
    plf = jax.jit(lambda p: ff.fused_field_apply_planar(p, pd, cfg))
    a = np.array(jax.device_get(rm(params)))[:, 0, :]
    b = np.array(jax.device_get(plf(params))).T
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    log(f"planar vs row-major fwd (on-chip, bf16): max rel {rel:.2e}")

    sig = jax.jit(lambda p: ff.fused_sigma_apply_planar(p, pts.T, cfg))
    c = np.array(jax.device_get(sig(params)))
    rel_s = np.abs(c - a[:, 3]).max() / (np.abs(a[:, 3]).max() + 1e-9)
    log(f"planar sigma vs row-major fwd alpha:    max rel {rel_s:.2e}")

    # ---- fwd timing at the flagship fine shape ----
    Nf = 16384 * 192
    ptsF = jax.random.normal(k[0], (Nf, 3))
    dirsF = jax.random.normal(k[1], (Nf, 3))
    pdF = jnp.concatenate([ptsF.T, dirsF.T], 0)

    f_rm = jax.jit(lambda p, x, d: ff.fused_field_apply(p, x[:, None, :], d, cfg)[..., 0, 0])
    f_pl = jax.jit(lambda p, x: ff.fused_field_apply_planar(p, x, cfg)[0])
    log(f"fwd row-major N=3.1M: {time_fn(f_rm, params, ptsF, dirsF)*1e3:7.1f} ms")
    log(f"fwd planar    N=3.1M: {time_fn(f_pl, params, pdF)*1e3:7.1f} ms")

    s_pl = jax.jit(lambda p, x: ff.fused_sigma_apply_planar(p, x, cfg))
    log(f"sigma planar  N=3.1M: {time_fn(s_pl, params, ptsF.T)*1e3:7.1f} ms")

    # ---- bwd ----
    # (the ROW-MAJOR bwd timing at this exact operand graph trips the remote
    # compiler's HTTP 500 — its in-train number is known: train 72.9k rays/s.
    # Parity first at small N, then planar timing.)
    def loss_rm(p, x, d):
        return jnp.sum(ff.fused_field_apply(p, x[:, None, :], d, cfg))

    def loss_pl(p, x):
        return jnp.sum(ff.fused_field_apply_planar(p, x, cfg))

    ga = np.array(jax.device_get(jax.jit(lambda p: jax.grad(loss_rm)(p, pts, dirs))(params)["mlp"]["pts_linears_0"]["kernel"]))
    gb = np.array(jax.device_get(jax.jit(lambda p: jax.grad(loss_pl)(p, pd))(params)["mlp"]["pts_linears_0"]["kernel"]))
    log(f"bwd dW0 planar vs row-major: max rel {np.abs(ga-gb).max()/(np.abs(ga).max()+1e-9):.2e}")

    g_pl = jax.jit(lambda p, x: jax.grad(loss_pl)(p, x)["mlp"]["rgb_linear"]["kernel"])
    log(f"fwd+bwd planar    N=3.1M: {time_fn(g_pl, params, pdF, iters=4)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
