"""Bisect the on-chip one-hot-epilogue miscompile (round-3 session-3).

perf_fused_render.py found fixed-z parity max-rel 0.7-1.0 on-chip (p50 fine)
after the session-2 epilogue (commit caa5b10) — CPU interpret is bit-exact,
so this is a Mosaic lowering issue in one of the new pieces. Both the main
and the coarse kernels fail, so the suspects are the shared ones:
  A. _transpose_small_pl (eye-dot [9,9]x[r_blk,9] ctr (1,),(1,))
  B. _bcast_dot ([C,r_blk]x[r_blk,N] ctr (1,),(0,)) with unaligned ctr dim
  C. their composition (the kernels' actual chain)
  D. the maps segment-sum dot with the HOST-built seg operand
Each probe stores ONE intermediate from a grid=(2,) kernel at the exact
failing shapes (S=192/r_blk=24 eval-fine, S=64/r_blk=72 eval-coarse, and
r_blk=8 the session-1-validated size) and compares vs numpy f64. Output
sublane counts are padded to 8-multiples (TPU BlockSpec rule; zero-filled).

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 1800 python tools/debug_epilogue_tpu.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from nerfsos_tpu.ops.pallas import fused_render as fr


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(kernel, ins, in_specs, out_shape, out_spec, grid):
    f = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False)
    return np.asarray(jax.jit(f)(*ins))


def rel(a, b):
    a64, b64 = np.float64(a), np.float64(b)
    d = np.abs(a64 - b64) / np.maximum(np.abs(b64), 1e-6)
    return float(d.max())


def probe(r_blk, S):
    n = r_blk * S
    odv = jax.random.normal(jax.random.PRNGKey(0), (2 * r_blk, 9), jnp.float32)
    z = jax.random.uniform(jax.random.PRNGKey(1), (2 * r_blk, S), jnp.float32) * 5 + 1
    oh, seg = fr._bcast_masks(r_blk, S)
    odv_np, oh_np = np.asarray(odv), np.asarray(oh)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM)

    # A: transpose only (out rows padded 9 -> 16)
    def k_t(odv_ref, out_ref):
        t = fr._transpose_small_pl(odv_ref[:])           # [9, r_blk]
        out_ref[:] = jnp.concatenate(
            [t, jnp.zeros((7, t.shape[1]), jnp.float32)], axis=0)
    got = run(k_t, (odv,), [row_spec],
              jax.ShapeDtypeStruct((2 * 16, r_blk), jnp.float32),
              pl.BlockSpec((16, r_blk), lambda i: (i, 0), memory_space=pltpu.VMEM),
              (2,))
    want = np.concatenate([odv_np[:r_blk].T, odv_np[r_blk:].T], 0)
    got_t = np.concatenate([got[0:9], got[16:25]], 0)
    log(f"  [r_blk={r_blk} S={S}] A transpose        max rel {rel(got_t, want):.2e}")

    # B: bcast from host-planar rows (8 rows: 6 data + 2 zero)
    rows = jnp.concatenate(
        [jnp.concatenate([odv[:r_blk, :6].T, jnp.zeros((2, r_blk))], 0),
         jnp.concatenate([odv[r_blk:, :6].T, jnp.zeros((2, r_blk))], 0)], 0)
    def k_b(rows_ref, oh_ref, out_ref):
        out_ref[:] = fr._bcast_dot(rows_ref[:], oh_ref[:])
    got = run(k_b, (rows, oh),
              [pl.BlockSpec((8, r_blk), lambda i: (i, 0), memory_space=pltpu.VMEM),
               full(oh)],
              jax.ShapeDtypeStruct((2 * 8, n), jnp.float32),
              pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
              (2,))
    want = np.concatenate([odv_np[:r_blk, :6].T @ oh_np,
                           odv_np[r_blk:, :6].T @ oh_np], 0)
    got_b = np.concatenate([got[0:6], got[8:14]], 0)
    log(f"  [r_blk={r_blk} S={S}] B bcast(host rows) max rel {rel(got_b, want):.2e}")

    # C: transpose -> slice -> bcast (the kernels' actual chain)
    def k_c(odv_ref, oh_ref, out_ref):
        odv_t = fr._transpose_small_pl(odv_ref[:])
        b = fr._bcast_dot(odv_t[0:6], oh_ref[:])
        out_ref[:] = jnp.concatenate([b, jnp.zeros((2, n), jnp.float32)], 0)
    got = run(k_c, (odv, oh), [row_spec, full(oh)],
              jax.ShapeDtypeStruct((2 * 8, n), jnp.float32),
              pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
              (2,))
    got_c = np.concatenate([got[0:6], got[8:14]], 0)
    log(f"  [r_blk={r_blk} S={S}] C transpose+bcast  max rel {rel(got_c, want):.2e}")

    # E: same chain with precision=HIGHEST on both dots (is the 3.7e-3
    # error bf16 operand rounding that a multi-pass f32 MXU lowering fixes?)
    def k_e(odv_ref, oh_ref, out_ref):
        t = jax.lax.dot_general(fr._eye_pl(9), odv_ref[:].astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        b = jax.lax.dot_general(t[0:6], oh_ref[:], (((1,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
        out_ref[:] = jnp.concatenate([b, jnp.zeros((2, n), jnp.float32)], 0)
    try:
        got = run(k_e, (odv, oh), [row_spec, full(oh)],
                  jax.ShapeDtypeStruct((2 * 8, n), jnp.float32),
                  pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  (2,))
        got_e = np.concatenate([got[0:6], got[8:14]], 0)
        log(f"  [r_blk={r_blk} S={S}] E chain HIGHEST    max rel {rel(got_e, want):.2e}")
    except Exception as e:
        log(f"  [r_blk={r_blk} S={S}] E chain HIGHEST    FAILED {type(e).__name__}: {str(e)[:120]}")

    # D: maps-style seg dot with the HOST-built seg operand
    vals = jax.random.normal(jax.random.PRNGKey(2), (8, n), jnp.float32)
    def k_d(vals_ref, seg_ref, out_ref):
        out_ref[:] = jax.lax.dot_general(
            seg_ref[:], vals_ref[:], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    got = run(k_d, (vals, seg), [full(vals), full(seg)],
              jax.ShapeDtypeStruct((r_blk, 8), jnp.float32),
              pl.BlockSpec((r_blk, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
              (1,))
    want = (np.asarray(vals) @ np.asarray(seg)).T
    log(f"  [r_blk={r_blk} S={S}] D seg maps dot     max rel {rel(got, want):.2e}")


def main():
    log(f"backend: {jax.default_backend()} {jax.devices()}")
    for r_blk, S in ((8, 192), (24, 192), (72, 64), (16, 64)):
        try:
            probe(r_blk, S)
        except Exception as e:
            log(f"  [r_blk={r_blk} S={S}] PROBE ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
