"""Probe: HBM cost of [N, C] (C tiny) vs [C, N] layouts on TPU.

A [N, 3] f32 array tiles its last two dims to (8, 128): the 3-lane minor dim
pads to 128 -> ~21x HBM amplification on every read/write. The fused field's
pts/dirs/raw streams are all this shape (N = 3.1M points for the fine pass:
1.6 GB each instead of 38 MB). [C, N] puts points on lanes and pads only
C -> 8 sublanes.

Measures, at the flagship fine-pass size (16384 rays x 192 samples):
  A. produce pts [N, 3]   = o + d*z, flattened row-major   (current layout)
  B. produce pts [3, N]   = same values, planar            (proposed)
  C. read-reduce each layout (sum)

Run: PYTHONPATH="$PYTHONPATH:/root/repo" python tools/perf_layout_probe.py
"""
import sys
import time

import jax
import jax.numpy as jnp

R, S = 16384, 192
N = R * S


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


def main():
    log("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    o = jax.random.normal(ks[0], (R, 3))
    d = jax.random.normal(ks[1], (R, 3))
    z = jax.random.uniform(ks[2], (R, S)) * 10

    @jax.jit
    def make_rowmajor(o, d, z):
        pts = o[:, None, :] + d[:, None, :] * z[..., None]  # [R, S, 3]
        return pts.reshape(N, 3)

    @jax.jit
    def make_planar(o, d, z):
        pts = o.T[:, :, None] + d.T[:, :, None] * z[None]  # [3, R, S]
        return pts.reshape(3, N)

    a = make_rowmajor(o, d, z)
    b = make_planar(o, d, z)

    log(f"A produce [N,3]: {time_fn(make_rowmajor, o, d, z)*1e3:6.2f} ms")
    log(f"B produce [3,N]: {time_fn(make_planar, o, d, z)*1e3:6.2f} ms")

    red_a = jax.jit(lambda x: jnp.sum(x * 1.000001))
    red_b = jax.jit(lambda x: jnp.sum(x * 1.000001))
    log(f"C reduce  [N,3]: {time_fn(red_a, a)*1e3:6.2f} ms")
    log(f"D reduce  [3,N]: {time_fn(red_b, b)*1e3:6.2f} ms")

    # E: raw-channel analog [N, 6] vs [6, N]
    r6 = jax.random.normal(ks[0], (N, 6))
    p6 = jnp.asarray(jnp.transpose(r6))
    log(f"E reduce  [N,6]: {time_fn(red_a, r6)*1e3:6.2f} ms")
    log(f"F reduce  [6,N]: {time_fn(red_b, p6)*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
