"""Mosaic lane-op support matrix for the fused-composite kernel design.

The in-kernel reshape [R_blk, S] <-> [1, R_blk*S] crashes the remote
compiler (HTTP 500, probed 2026-08-17), so the planned ray-fused composite
must stay entirely on the LANE axis: segmented doubling scans with iota
masks, per-ray broadcast via unrolled masked multiply-adds, segment
extraction via unaligned lane slices. This probes each primitive on-chip.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 900 python tools/probe_lane_ops.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_blk, S = 8, 192
N = R_blk * S


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(name, kernel, inputs, out_shape, golden):
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(x.shape, lambda: (0,) * x.ndim,
                               memory_space=pltpu.VMEM) for x in inputs],
        out_specs=pl.BlockSpec(out_shape.shape, lambda: (0,) * len(out_shape.shape),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )
    try:
        got = np.asarray(f(*inputs))
        ok = np.allclose(got, golden, atol=1e-6)
        log(f"{name}: {'OK' if ok else 'WRONG VALUES'}")
        return ok
    except Exception as e:
        log(f"{name}: FAIL {str(e)[:160]}")
        return False


def main():
    x = jnp.arange(N, dtype=jnp.float32).reshape(1, N)
    xn = np.asarray(x)

    # 1. unaligned lane slice read
    def k_slice(x_ref, o_ref):
        o_ref[:] = jnp.concatenate(
            [x_ref[:, 5:5 + 96], x_ref[:, 300:300 + 96]], axis=1)
    run("unaligned lane slice+concat", k_slice, [x],
        jax.ShapeDtypeStruct((1, 192), jnp.float32),
        np.concatenate([xn[:, 5:101], xn[:, 300:396]], 1))

    # 2. unaligned lane slice STORE
    def k_store(x_ref, o_ref):
        o_ref[:] = jnp.zeros((1, N), jnp.float32)
        o_ref[0, 7:7 + 192] = x_ref[0, 0:192]
    g = np.zeros((1, N), np.float32)
    g[0, 7:199] = xn[0, :192]
    run("unaligned lane store", k_store, [x],
        jax.ShapeDtypeStruct((1, N), jnp.float32), g)

    # 3. shift-right by k via concat (the scan primitive), k=3
    def k_shift(x_ref, o_ref):
        k = 3
        o_ref[:] = jnp.concatenate(
            [jnp.full((1, k), 1.0), x_ref[:, :-k]], axis=1)
    g = np.concatenate([np.ones((1, 3), np.float32), xn[:, :-3]], 1)
    run("lane shift via concat", k_shift, [x],
        jax.ShapeDtypeStruct((1, N), jnp.float32), g)

    # 4. iota + mod mask
    def k_mask(x_ref, o_ref):
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % S
        o_ref[:] = jnp.where(pos >= 2, x_ref[:], 0.0)
    pos = np.arange(N) % S
    run("iota mod mask", k_mask, [x],
        jax.ShapeDtypeStruct((1, N), jnp.float32),
        np.where(pos >= 2, xn, 0.0))

    # 5. full segmented exclusive cumprod (the transmittance scan):
    # 8 doubling steps of shift+mask+multiply on [1, N]
    def k_scan(x_ref, o_ref):
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % S
        v = jnp.where(pos >= 1,
                      jnp.concatenate([jnp.ones((1, 1)), x_ref[:, :-1]], 1),
                      1.0)
        k = 1
        while k < S:
            sh = jnp.concatenate([jnp.ones((1, k)), v[:, :-k]], axis=1)
            v = v * jnp.where(pos >= k + 1, sh, 1.0)
            k *= 2
        o_ref[:] = v
    xs = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (1, N))) * 0.02 + 0.98
    golden = np.ones_like(xs)
    seg = xs.reshape(R_blk, S)
    gseg = np.ones_like(seg)
    gseg[:, 1:] = np.cumprod(seg[:, :-1], axis=1)
    run("segmented exclusive cumprod", k_scan, [jnp.asarray(xs)],
        jax.ShapeDtypeStruct((1, N), jnp.float32), gseg.reshape(1, N))

    # 6. per-ray broadcast via unrolled masked adds: o[c,n] = base[c, n//S]
    base = jnp.arange(3 * R_blk, dtype=jnp.float32).reshape(3, R_blk)

    def k_bcast(b_ref, o_ref):
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) // S
        acc = jnp.zeros((3, N), jnp.float32)
        for r in range(R_blk):
            acc = acc + jnp.where(pos == r, 1.0, 0.0) * b_ref[:, r:r + 1]
        o_ref[:] = acc
    g = np.repeat(np.asarray(base), S, axis=1)
    run("segment broadcast (masked madd)", k_bcast, [base],
        jax.ShapeDtypeStruct((3, N), jnp.float32), g)

    # 7. segment-sum via one-hot matmul [C,N] x [N,R_blk] (bf16 rounding!)
    def k_segsum(x_ref, o_ref):
        pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) // S
        rid = jax.lax.broadcasted_iota(jnp.int32, (N, R_blk), 1)
        segm = (pos == rid).astype(jnp.float32)
        o_ref[:] = jnp.dot(x_ref[:], segm, preferred_element_type=jnp.float32)
    g = xn.reshape(R_blk, S).sum(1).reshape(1, R_blk)
    run("segment sum via one-hot dot f32", k_segsum, [x],
        jax.ShapeDtypeStruct((1, R_blk), jnp.float32), g)

    # 8. strided lane gather: pick lane r*S per ray -> [1, R_blk]
    def k_pick(x_ref, o_ref):
        o_ref[:] = jnp.concatenate(
            [x_ref[:, r * S:r * S + 1] for r in range(R_blk)], axis=1)
    g = xn[:, ::S][:, :R_blk]
    run("segment-head pick via 1-lane slices", k_pick, [x],
        jax.ShapeDtypeStruct((1, R_blk), jnp.float32), g)


if __name__ == "__main__":
    main()
