"""Flash-style blockwise Pallas kernel for the geometry correlation loss.

The reference geo loss (``utils/image.py:373-482`` in VITA-Group/NeRF-SOS)
correlates every pixel of a patch against every pixel: with the flagship
8 x 64x64 patches, the ``fd``/``cd`` tensors are [8, 64,64, 64,64] — 537 MB
EACH in fp32. The XLA lowering materializes them in HBM (measured 31.6 ms per
loss call on one v5e, pure bandwidth; ``tools/perf_sos_breakdown.py``), which
makes the loss ~12% of the whole SOS train step.

This kernel never materializes the pairwise tensors: it streams (row-block x
col-block) tiles through VMEM, flash-attention style, in two passes —

  pass 1  row sums of  fd[n,p,q] = min(1/(sum_c |f1[n,p,c] - f2[n,c,q]| + .05),
                                       max_depth)
          (the pointwise-recentering statistics; [B, N] output)
  pass 2  loss sum of  -max(cd, 0) * (fd - rowmean[p] + gmean - shift)
          where cd is the SAME clamped inverse-L1 kernel applied to the
          channel-normalized codes (``GeoCorrelationLoss.tensor_correlation``
          is used for BOTH sides — reference ``utils/image.py:404-427``; cd is
          therefore strictly positive and the zero-clamp is a no-op)

and a backward pass that recomputes the tiles and accumulates the code-side
cotangents (``fd`` is computed under stop-gradient in the reference — no
gradient flows to the points/depth, so the backward touches only ``c``).

Pointwise-recenter equivalence: the reference computes
``fd - fd.mean((3,4),keepdims) - (fd - ...).mean() + fd.mean()``; the inner
global mean of the row-centered tensor is exactly 0 in real arithmetic, so
this reduces to ``fd - rowmean + gmean`` (float discrepancy ~1e-7, covered by
the parity test).

All arithmetic is fp32 on the VPU — no MXU, no bf16 rounding anywhere.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Row-block (sublane) size of the N x N sweeps. Grid-step overhead dominates
# the tiny VPU tile compute (~8 vs ~0.6 us measured on v5e), so fewer/bigger
# tiles win until VMEM pressure bites — sweepable knob, re-measure on chip
# after kernel changes (tools/perf_flash_bi.py). Measured at the flagship SOS
# shape (one v5e, 2026-08-19, paired fwd+bwd): 128 -> 13.11 ms, 256 ->
# 12.11 ms, 512 -> 13.76 ms; in-step SOS 326.6 -> 321.1 ms same-session.
_FLASH_BI = 256

# The 256/512-row blocks overflow the default 16 MB VMEM scoped stack (the
# paired backward holds ~5 fp32 [bi, 4096] temporaries); raise the cap like
# fused_render.py does — the sequential-grid reduction pattern doesn't use
# the pipelining headroom the default reserves. Without this, 256/512 fail
# at RUNTIME on chip (session-3 sweep) while interpret mode passes.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_blocks(n: int) -> Optional[Tuple[int, int]]:
    """(row block, col block) for an N x N pairwise sweep.

    Prefer FEW, WIDE tiles: full rows (lanes) up to 4096 and _FLASH_BI
    sublanes — at the default 256 a [256, 4096] fp32 tile is 4 MB and the
    paired backward holds ~5 of them live, which only fits because
    _COMPILER_PARAMS raises the VMEM scoped-stack cap (see its comment).
    """
    bj = next((b for b in (4096, 2048, 1024, 512, 256, 128) if n % b == 0), None)
    if bj is None:
        return None
    bi = _FLASH_BI if n % _FLASH_BI == 0 else 128
    return bi, bj


def flash_supported(n: int) -> bool:
    """The kernel tiles N into 128-multiple blocks; other N fall back to XLA."""
    return n % 128 == 0


def _fd_tile(f1, f2, max_depth: float) -> jnp.ndarray:
    """[bi, C] x [C, bj] -> clamped inverse-L1 tile [bi, bj] (fp32 VPU)."""
    C = f1.shape[-1]
    acc = jnp.zeros((f1.shape[0], f2.shape[1]), jnp.float32)
    for c in range(C):
        acc = acc + jnp.abs(f1[:, c:c + 1] - f2[c:c + 1, :])
    return jnp.minimum(1.0 / (acc + 5e-2), max_depth)


def _l1_tile(c1, c2) -> jnp.ndarray:
    """[bi, S] x [S, bj] -> sum_s |c1[p,s] - c2[s,q]| (fp32 VPU)."""
    S = c1.shape[-1]
    acc = jnp.abs(c1[:, 0:1] - c2[0:1, :])
    for s in range(1, S):
        acc = acc + jnp.abs(c1[:, s:s + 1] - c2[s:s + 1, :])
    return acc


def _cd_tile(c1, c2, max_depth: float) -> jnp.ndarray:
    """Code-side correlation tile: the same clamped inverse-L1 kernel as fd,
    applied to the normalized codes (strictly positive)."""
    return jnp.minimum(1.0 / (_l1_tile(c1, c2) + 5e-2), max_depth)


def _rowsum_kernel(f1_ref, f2_ref, out_ref, *, max_depth: float):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    out_ref[0, :, :] += jnp.sum(fd, axis=1, keepdims=True)


def _loss_kernel(f1_ref, f2_ref, c1_ref, c2_ref, rowmean_ref, gmean_ref,
                 out_ref, *, shift: float, max_depth: float):
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gmean_ref[0, 0] - shift)
    cdc = _cd_tile(c1_ref[0], c2_ref[0], max_depth)  # > 0: zero-clamp no-op
    out_ref[0, 0] += jnp.sum(-cdc * fd2)


def _bwd_kernel(f1_ref, f2_ref, c1_ref, c2_ref, rowmean_ref, gmean_ref,
                coeff_ref, dc1_ref, dc2_ref, *, shift: float, max_depth: float):
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bj = f2_ref.shape[2]

    # dc1 rides a per-(n, i) output block (j varies fastest -> consecutive
    # accumulation); dc2 must be a full-array VMEM accumulator (its (n, j)
    # blocks would be revisited non-consecutively). Layouts matter: [B, S, N]
    # keeps N on lanes (1 MB padded); a full [B, N, S] accumulator would
    # lane-pad S=2 -> 128 (16 MB — blows the VMEM stack inside the train step).
    @pl.when(j == 0)
    def _():
        dc1_ref[:] = jnp.zeros_like(dc1_ref)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        dc2_ref[:] = jnp.zeros_like(dc2_ref)

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gmean_ref[0, 0] - shift)
    c1 = c1_ref[0]
    c2 = c2_ref[0]
    d = _l1_tile(c1, c2)
    r = 1.0 / (d + 5e-2)
    # loss term = -min(r, max_depth) * fd2 (cd > 0, zero-clamp passes through).
    # d/dr of the min: 1 where r <= max_depth (torch's masked assignment
    # ``ret[ret > maxd] = maxd`` zeroes grads only STRICTLY above the bound);
    # dr/dd = -r^2; coeff carries upstream g / count.
    dd = jnp.where(r <= max_depth, coeff_ref[0, 0] * fd2 * r * r, 0.0)

    S = c1_ref.shape[2]
    dc1_tile = jnp.concatenate(
        [jnp.sum(dd * jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                 axis=1, keepdims=True) for s in range(S)],
        axis=1,
    )  # [bi, S]
    dc2_tile = jnp.concatenate(
        [jnp.sum(dd * -jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                 axis=0, keepdims=True) for s in range(S)],
        axis=0,
    )  # [S, bj]
    dc1_ref[0, :, :] += dc1_tile
    dc2_ref[n, :, pl.dslice(j * bj, bj)] += dc2_tile


def _grids_and_specs(B, N, bi, bj, S):
    grid = (B, N // bi, N // bj)
    f1_spec = pl.BlockSpec((1, bi, 3), lambda n, i, j: (n, i, 0),
                           memory_space=pltpu.VMEM)
    f2_spec = pl.BlockSpec((1, 3, bj), lambda n, i, j: (n, 0, j),
                           memory_space=pltpu.VMEM)
    c1_spec = pl.BlockSpec((1, bi, S), lambda n, i, j: (n, i, 0),
                           memory_space=pltpu.VMEM)
    c2_spec = pl.BlockSpec((1, S, bj), lambda n, i, j: (n, 0, j),
                           memory_space=pltpu.VMEM)
    rm_spec = pl.BlockSpec((1, bi, 1), lambda n, i, j: (n, i, 0),
                           memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1), lambda n, i, j: (0, 0),
                               memory_space=pltpu.SMEM)
    return grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, scalar_spec


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _row_stats(f1v, f2v, max_depth, interpret):
    B, N, _ = f1v.shape
    bi, bj = _pick_blocks(N)
    grid, f1_spec, f2_spec, *_ = _grids_and_specs(B, N, bi, bj, 1)
    rowsum = pl.pallas_call(
        functools.partial(_rowsum_kernel, max_depth=max_depth),
        grid=grid,
        in_specs=[f1_spec, f2_spec],
        out_specs=pl.BlockSpec((1, bi, 1), lambda n, i, j: (n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, 1), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v)
    rowmean = rowsum / N
    gmean = jnp.mean(rowmean)
    return rowmean, gmean


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_geo_mean(f1v, f2v, c1v, c2v, shift, max_depth, interpret, axis):
    loss, _ = _flash_geo_fwd(f1v, f2v, c1v, c2v, shift, max_depth, interpret,
                             axis)
    return loss


def _flash_geo_fwd(f1v, f2v, c1v, c2v, shift, max_depth, interpret, axis):
    if interpret is None:
        interpret = _interpret_default()
    B, N, _ = f1v.shape
    S = c1v.shape[-1]
    bi, bj = _pick_blocks(N)
    rowmean, gmean = _row_stats(f1v, f2v, max_depth, interpret)
    if axis is not None:
        # sharded batch dim: the pointwise-recenter global mean is BATCH-
        # global (equal shard sizes -> pmean of shard means is exact)
        gmean = jax.lax.pmean(gmean, axis)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B, N, bi, bj, S)
    total = pl.pallas_call(
        functools.partial(_loss_kernel, shift=shift, max_depth=max_depth),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec],
        out_specs=pl.BlockSpec((1, 1), lambda n, i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1v, c2v, rowmean, gmean.reshape(1, 1))
    count = B * N * N
    return total[0, 0] / count, (f1v, f2v, c1v, c2v, rowmean, gmean)


def _flash_geo_bwd(shift, max_depth, interpret, axis, residuals, g):
    if interpret is None:
        interpret = _interpret_default()
    f1v, f2v, c1v, c2v, rowmean, gmean = residuals
    B, N, _ = f1v.shape
    S = c1v.shape[-1]
    bi, bj = _pick_blocks(N)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B, N, bi, bj, S)
    coeff = (g / (B * N * N)).astype(jnp.float32).reshape(1, 1)
    dc1, dc2 = pl.pallas_call(
        functools.partial(_bwd_kernel, shift=shift, max_depth=max_depth),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec, sc_spec],
        out_specs=[
            pl.BlockSpec((1, bi, S), lambda n, i, j: (n, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, S, N), lambda n, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1v, c2v, rowmean, gmean.reshape(1, 1), coeff)
    # fd is stop-gradient in the reference (no_grad): zero cotangents for f.
    return jnp.zeros_like(f1v), jnp.zeros_like(f2v), dc1, dc2


_flash_geo_mean.defvjp(_flash_geo_fwd, _flash_geo_bwd)


def _loss_kernel2(f1_ref, f2_ref, c1a_ref, c2a_ref, c1b_ref, c2b_ref,
                  rowmean_ref, gmean_ref, out_ref, *, shift: float,
                  max_depth: float):
    """Paired loss sweep: ONE fd tile, TWO code-side correlations.

    The SOS step evaluates the geometry loss for the coarse AND fine semantic
    heads against the SAME point tensors (f-sides and negative index are
    bit-identical when negatives come from the sim-matrix argmin) — pairing
    halves the loss sweeps and their fd recompute. Each half accumulates into
    its own SMEM cell in the same tile order as the unpaired kernel, so the
    two sums are bit-equal to two separate calls."""
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gmean_ref[0, 0] - shift)
    cda = _cd_tile(c1a_ref[0], c2a_ref[0], max_depth)
    out_ref[0, 0] += jnp.sum(-cda * fd2)
    cdb = _cd_tile(c1b_ref[0], c2b_ref[0], max_depth)
    out_ref[0, 1] += jnp.sum(-cdb * fd2)


def _bwd_kernel2(f1_ref, f2_ref, c1a_ref, c2a_ref, c1b_ref, c2b_ref,
                 rowmean_ref, gmean_ref, coeff_ref,
                 dc1a_ref, dc2a_ref, dc1b_ref, dc2b_ref, *, shift: float,
                 max_depth: float):
    """Paired backward sweep: fd tile once, both halves' code cotangents.
    Accumulator layouts as in _bwd_kernel (dc1 per-(n,i) block, dc2 full-array
    [B, S, N] — N on lanes)."""
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bj = f2_ref.shape[2]

    @pl.when(j == 0)
    def _():
        dc1a_ref[:] = jnp.zeros_like(dc1a_ref)
        dc1b_ref[:] = jnp.zeros_like(dc1b_ref)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        dc2a_ref[:] = jnp.zeros_like(dc2a_ref)
        dc2b_ref[:] = jnp.zeros_like(dc2b_ref)

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gmean_ref[0, 0] - shift)
    S = c1a_ref.shape[2]
    for c1_ref, c2_ref, coeff_col, dc1_ref, dc2_ref in (
            (c1a_ref, c2a_ref, 0, dc1a_ref, dc2a_ref),
            (c1b_ref, c2b_ref, 1, dc1b_ref, dc2b_ref)):
        c1 = c1_ref[0]
        c2 = c2_ref[0]
        d = _l1_tile(c1, c2)
        r = 1.0 / (d + 5e-2)
        dd = jnp.where(r <= max_depth, coeff_ref[0, coeff_col] * fd2 * r * r, 0.0)
        dc1_tile = jnp.concatenate(
            [jnp.sum(dd * jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                     axis=1, keepdims=True) for s in range(S)],
            axis=1,
        )
        dc2_tile = jnp.concatenate(
            [jnp.sum(dd * -jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                     axis=0, keepdims=True) for s in range(S)],
            axis=0,
        )
        dc1_ref[0, :, :] += dc1_tile
        dc2_ref[n, :, pl.dslice(j * bj, bj)] += dc2_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash_geo_mean2(f1v, f2v, c1av, c2av, c1bv, c2bv, shift, max_depth,
                     interpret, axis):
    loss2, _ = _flash_geo_fwd2(f1v, f2v, c1av, c2av, c1bv, c2bv, shift,
                               max_depth, interpret, axis)
    return loss2


def _flash_geo_fwd2(f1v, f2v, c1av, c2av, c1bv, c2bv, shift, max_depth,
                    interpret, axis):
    if interpret is None:
        interpret = _interpret_default()
    B, N, _ = f1v.shape
    S = c1av.shape[-1]
    bi, bj = _pick_blocks(N)
    rowmean, gmean = _row_stats(f1v, f2v, max_depth, interpret)
    if axis is not None:
        gmean = jax.lax.pmean(gmean, axis)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B, N, bi, bj, S)
    total2 = pl.pallas_call(
        functools.partial(_loss_kernel2, shift=shift, max_depth=max_depth),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, c1_spec, c2_spec,
                  rm_spec, sc_spec],
        out_specs=pl.BlockSpec((1, 2), lambda n, i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gmean.reshape(1, 1))
    count = B * N * N
    return total2[0] / count, (f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gmean)


def _flash_geo_bwd2(shift, max_depth, interpret, axis, residuals, g):
    if interpret is None:
        interpret = _interpret_default()
    f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gmean = residuals
    B, N, _ = f1v.shape
    S = c1av.shape[-1]
    bi, bj = _pick_blocks(N)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B, N, bi, bj, S)
    coeff2 = (g / (B * N * N)).astype(jnp.float32).reshape(1, 2)
    sc2_spec = pl.BlockSpec((1, 2), lambda n, i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    dc1_spec = pl.BlockSpec((1, bi, S), lambda n, i, j: (n, i, 0),
                            memory_space=pltpu.VMEM)
    dc2_spec = pl.BlockSpec((B, S, N), lambda n, i, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    dc1a, dc2a, dc1b, dc2b = pl.pallas_call(
        functools.partial(_bwd_kernel2, shift=shift, max_depth=max_depth),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, c1_spec, c2_spec,
                  rm_spec, sc_spec, sc2_spec],
        out_specs=[dc1_spec, dc2_spec, dc1_spec, dc2_spec],
        out_shape=[jax.ShapeDtypeStruct((B, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, S, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gmean.reshape(1, 1), coeff2)
    return (jnp.zeros_like(f1v), jnp.zeros_like(f2v), dc1a, dc2a, dc1b, dc2b)


_flash_geo_mean2.defvjp(_flash_geo_fwd2, _flash_geo_bwd2)


def _loss_kernel_quad(f1_ref, f2_ref, c1a_ref, c2a_ref, c1b_ref, c2b_ref,
                      rowmean_ref, gmean_ref, out_ref, *, shift_lo: float,
                      shift_hi: float, max_depth: float, b_half: int):
    """Quad loss sweep: the NEG and SELF sweeps of the SOS step batched on
    the leading axis (rows [0, b_half) = neg with shift_lo, rows [b_half, 2*
    b_half) = self with shift_hi), each with TWO code-side correlations
    (coarse/fine heads). One pallas_call replaces two paired calls: the SOS
    step's geometry loss drops from 6 kernel sweeps to 3 (1 rowstats + 1
    loss + 1 bwd). Accumulation per output cell keeps the unpaired tile
    order (pl.when-guarded adds), so each of the four sums is bit-equal to
    its separate call."""
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    in_lo = n < b_half

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        for col in range(4):
            out_ref[0, col] = 0.0

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    gm = jnp.where(in_lo, gmean_ref[0, 0], gmean_ref[0, 1])
    sh = jnp.where(in_lo, shift_lo, shift_hi)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gm - sh)
    va = jnp.sum(-_cd_tile(c1a_ref[0], c2a_ref[0], max_depth) * fd2)
    vb = jnp.sum(-_cd_tile(c1b_ref[0], c2b_ref[0], max_depth) * fd2)

    @pl.when(in_lo)
    def _():
        out_ref[0, 0] += va
        out_ref[0, 1] += vb

    @pl.when(jnp.logical_not(in_lo))
    def _():
        out_ref[0, 2] += va
        out_ref[0, 3] += vb


def _bwd_kernel_quad(f1_ref, f2_ref, c1a_ref, c2a_ref, c1b_ref, c2b_ref,
                     rowmean_ref, gmean_ref, coeff_ref,
                     dc1a_ref, dc2a_ref, dc1b_ref, dc2b_ref, *,
                     shift_lo: float, shift_hi: float, max_depth: float,
                     b_half: int):
    """Backward of the quad sweep (accumulator layouts as in _bwd_kernel;
    coeff [1, 4] columns = (neg_a, neg_b, self_a, self_b))."""
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bj = f2_ref.shape[2]
    in_lo = n < b_half

    @pl.when(j == 0)
    def _():
        dc1a_ref[:] = jnp.zeros_like(dc1a_ref)
        dc1b_ref[:] = jnp.zeros_like(dc1b_ref)

    @pl.when((n == 0) & (i == 0) & (j == 0))
    def _():
        dc2a_ref[:] = jnp.zeros_like(dc2a_ref)
        dc2b_ref[:] = jnp.zeros_like(dc2b_ref)

    fd = _fd_tile(f1_ref[0], f2_ref[0], max_depth)
    gm = jnp.where(in_lo, gmean_ref[0, 0], gmean_ref[0, 1])
    sh = jnp.where(in_lo, shift_lo, shift_hi)
    fd2 = fd - rowmean_ref[0, :, 0:1] + (gm - sh)
    S = c1a_ref.shape[2]
    for c1_ref, c2_ref, lo_col, dc1_ref, dc2_ref in (
            (c1a_ref, c2a_ref, 0, dc1a_ref, dc2a_ref),
            (c1b_ref, c2b_ref, 1, dc1b_ref, dc2b_ref)):
        c1 = c1_ref[0]
        c2 = c2_ref[0]
        d = _l1_tile(c1, c2)
        r = 1.0 / (d + 5e-2)
        co = jnp.where(in_lo, coeff_ref[0, lo_col], coeff_ref[0, 2 + lo_col])
        dd = jnp.where(r <= max_depth, co * fd2 * r * r, 0.0)
        dc1_tile = jnp.concatenate(
            [jnp.sum(dd * jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                     axis=1, keepdims=True) for s in range(S)],
            axis=1,
        )
        dc2_tile = jnp.concatenate(
            [jnp.sum(dd * -jnp.sign(c1[:, s:s + 1] - c2[s:s + 1, :]),
                     axis=0, keepdims=True) for s in range(S)],
            axis=0,
        )
        dc1_ref[0, :, :] += dc1_tile
        dc2_ref[n, :, pl.dslice(j * bj, bj)] += dc2_tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash_geo_mean_quad(f1v, f2v, c1av, c2av, c1bv, c2bv, shift_lo, shift_hi,
                         max_depth, interpret, axis):
    loss4, _ = _flash_geo_fwd_quad(f1v, f2v, c1av, c2av, c1bv, c2bv, shift_lo,
                                   shift_hi, max_depth, interpret, axis)
    return loss4


def _flash_geo_fwd_quad(f1v, f2v, c1av, c2av, c1bv, c2bv, shift_lo, shift_hi,
                        max_depth, interpret, axis):
    if interpret is None:
        interpret = _interpret_default()
    B2, N, _ = f1v.shape
    b_half = B2 // 2
    S = c1av.shape[-1]
    bi, bj = _pick_blocks(N)
    rowmean, _ = _row_stats(f1v, f2v, max_depth, interpret)
    # per-half global means (each half is one helper_mean call's recenter)
    gm = jnp.stack([jnp.mean(rowmean[:b_half]), jnp.mean(rowmean[b_half:])])
    if axis is not None:
        gm = jax.lax.pmean(gm, axis)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B2, N, bi, bj, S)
    sc2_spec = pl.BlockSpec((1, 2), lambda n, i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    total4 = pl.pallas_call(
        functools.partial(_loss_kernel_quad, shift_lo=shift_lo,
                          shift_hi=shift_hi, max_depth=max_depth,
                          b_half=b_half),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, c1_spec, c2_spec,
                  rm_spec, sc2_spec],
        out_specs=pl.BlockSpec((1, 4), lambda n, i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gm.reshape(1, 2))
    count = b_half * N * N
    return total4[0] / count, (f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gm)


def _flash_geo_bwd_quad(shift_lo, shift_hi, max_depth, interpret, axis,
                        residuals, g):
    if interpret is None:
        interpret = _interpret_default()
    f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gm = residuals
    B2, N, _ = f1v.shape
    b_half = B2 // 2
    S = c1av.shape[-1]
    bi, bj = _pick_blocks(N)
    grid, f1_spec, f2_spec, c1_spec, c2_spec, rm_spec, sc_spec = \
        _grids_and_specs(B2, N, bi, bj, S)
    coeff4 = (g / (b_half * N * N)).astype(jnp.float32).reshape(1, 4)
    sc4_spec = pl.BlockSpec((1, 4), lambda n, i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    sc2_spec = pl.BlockSpec((1, 2), lambda n, i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    dc1_spec = pl.BlockSpec((1, bi, S), lambda n, i, j: (n, i, 0),
                            memory_space=pltpu.VMEM)
    dc2_spec = pl.BlockSpec((B2, S, N), lambda n, i, j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    dc1a, dc2a, dc1b, dc2b = pl.pallas_call(
        functools.partial(_bwd_kernel_quad, shift_lo=shift_lo,
                          shift_hi=shift_hi, max_depth=max_depth,
                          b_half=b_half),
        grid=grid,
        in_specs=[f1_spec, f2_spec, c1_spec, c2_spec, c1_spec, c2_spec,
                  rm_spec, sc2_spec, sc4_spec],
        out_specs=[dc1_spec, dc2_spec, dc1_spec, dc2_spec],
        out_shape=[jax.ShapeDtypeStruct((B2, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B2, S, N), jnp.float32),
                   jax.ShapeDtypeStruct((B2, N, S), jnp.float32),
                   jax.ShapeDtypeStruct((B2, S, N), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(f1v, f2v, c1av, c2av, c1bv, c2bv, rowmean, gm.reshape(1, 2), coeff4)
    return (jnp.zeros_like(f1v), jnp.zeros_like(f2v), dc1a, dc2a, dc1b, dc2b)


_flash_geo_mean_quad.defvjp(_flash_geo_fwd_quad, _flash_geo_bwd_quad)


def flash_geo_pair_quad(
    feats: jnp.ndarray,      # [B, C, H, W] raw back-projected points
    neg_feats: jnp.ndarray,
    c0n: jnp.ndarray,        # [B, S, H, W] channel-NORMALIZED coarse codes
    c0n_neg: jnp.ndarray,
    c1n: jnp.ndarray,        # fine codes
    c1n_neg: jnp.ndarray,
    shift_neg: float,
    shift_self: float,
    max_depth: float,
    interpret: Optional[bool] = None,
    axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The SOS step's FOUR geometry helper_mean results in ONE kernel group.

    Returns (neg_coarse, neg_fine, self_coarse, self_fine) — each bit-equal
    to its ``flash_geo_helper_mean`` call. The neg sweep (feats x neg_feats)
    and the self sweep (feats x feats) are stacked on the batch axis; the
    coarse/fine heads share each sweep's fd tile (the round-3 pairing).
    """
    B, C, H, W = feats.shape
    N = H * W
    S = c0n.shape[1]

    def fv(a, b):
        return (a.reshape(B, C, N).transpose(0, 2, 1), b.reshape(B, C, N))

    def cv(a, b):
        return (a.reshape(B, S, N).transpose(0, 2, 1), b.reshape(B, S, N))

    f1n, f2n = fv(feats, neg_feats)
    f1s, f2s = fv(feats, feats)
    c1an, c2an = cv(c0n, c0n_neg)
    c1as, c2as = cv(c0n, c0n)
    c1bn, c2bn = cv(c1n, c1n_neg)
    c1bs, c2bs = cv(c1n, c1n)
    out4 = _flash_geo_mean_quad(
        jnp.concatenate([f1n, f1s]), jnp.concatenate([f2n, f2s]),
        jnp.concatenate([c1an, c1as]), jnp.concatenate([c2an, c2as]),
        jnp.concatenate([c1bn, c1bs]), jnp.concatenate([c2bn, c2bs]),
        float(shift_neg), float(shift_self), float(max_depth), interpret,
        axis)
    return out4[0], out4[1], out4[2], out4[3]


def flash_geo_helper_mean_pair(
    f1: jnp.ndarray,    # [B, C, H, W] raw back-projected points (C=3)
    f2: jnp.ndarray,
    c1n_a: jnp.ndarray,  # [B, S, H, W] channel-NORMALIZED codes, half a
    c2n_a: jnp.ndarray,
    c1n_b: jnp.ndarray,  # half b
    c2n_b: jnp.ndarray,
    shift: float,
    max_depth: float,
    interpret: Optional[bool] = None,
    axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two ``flash_geo_helper_mean`` results sharing one fd sweep.

    Bit-equal to two separate calls (same tile order, separate accumulators)
    at ~half the sweep cost — the f-sides and therefore fd, the row stats and
    the recentering means are shared; only the code-side correlation and its
    backward differ per half."""
    B, C, H, W = f1.shape
    N = H * W
    S = c1n_a.shape[1]
    f1v = f1.reshape(B, C, N).transpose(0, 2, 1)
    f2v = f2.reshape(B, C, N)

    def cv(c1n, c2n):
        return (c1n.reshape(B, S, N).transpose(0, 2, 1), c2n.reshape(B, S, N))

    c1av, c2av = cv(c1n_a, c2n_a)
    c1bv, c2bv = cv(c1n_b, c2n_b)
    out2 = _flash_geo_mean2(f1v, f2v, c1av, c2av, c1bv, c2bv, float(shift),
                            float(max_depth), interpret, axis)
    return out2[0], out2[1]


def flash_geo_helper_mean(
    f1: jnp.ndarray,   # [B, C, H, W] raw back-projected points (C=3)
    f2: jnp.ndarray,
    c1n: jnp.ndarray,  # [B, S, H, W] channel-NORMALIZED semantic codes
    c2n: jnp.ndarray,
    shift: float,
    max_depth: float,
    interpret: Optional[bool] = None,
    axis: Optional[str] = None,
) -> jnp.ndarray:
    """mean over [B,H,W,I,J] of -max(cd,0) * (recenter(fd) - shift).

    Drop-in scalar equivalent of
    ``GeoCorrelationLoss.helper(f1,f2,c1,c2,shift).mean()`` with
    ``pointwise=True, zero_clamp=True, stabilize=False`` (the flagship and
    only shipped configuration) — differentiable w.r.t. the codes.
    ``axis``: shard_map axis when the batch dim is sharded — the recentering
    global mean rides a pmean so per-shard results compose exactly.
    """
    B, C, H, W = f1.shape
    N = H * W
    S = c1n.shape[1]
    f1v = f1.reshape(B, C, N).transpose(0, 2, 1)
    f2v = f2.reshape(B, C, N)
    c1v = c1n.reshape(B, S, N).transpose(0, 2, 1)
    c2v = c2n.reshape(B, S, N)
    return _flash_geo_mean(f1v, f2v, c1v, c2v, float(shift), float(max_depth),
                           interpret, axis)
