"""Pallas TPU kernels: fully-fused eval render (field + volumetric composite).

Round-2 shipped the planar field kernels ([C, N] IO, points on lanes) with the
compositing left to XLA. A profiler trace of the 65536-ray eval render
(2026-08-17, tools/perf_r3_baseline.py) showed the price: ~40 ms of the
181 ms step was XLA *layout conversion* — `while`-loop relayouts between the
row-major ray world ([R,S] / [N,3]) and the planar kernel streams
(three [3, 12.58M] input transposes at ~4.4 ms each, plus the [6,N] -> [6,R,S]
raw-output reshape at ~8 ms), not math.

These kernels delete that interface entirely: each grid step takes one block
of R_blk RAYS (per-ray origins/dirs/viewdirs [9, R_blk] and z-values
[R_blk, S]), builds the sample points IN KERNEL, runs the planar MLP, and
composites to per-ray maps in VMEM. HBM traffic drops from ~700 MB
(planar streams + relayouts) to z in (50 MB) + weights out (50 MB) + maps.

The toolchain cannot reshape between lane- and sublane-major layouts inside a
kernel (plain `[R_blk,S] <-> [1, R_blk*S]` reshapes crash the remote compiler
— probed 2026-08-17), so everything stays on the LANE axis, using only the
primitives validated on-chip by ``tools/probe_lane_ops.py``:

- segment id / sample id from ``broadcasted_iota`` (+ mod/div by static S);
- per-ray -> per-point broadcast via one-hot f32 dots at
  ``precision=HIGHEST`` (these feed the PE trig, so no MXU rounding is
  allowed — Mosaic's DEFAULT-precision f32 dot bf16-rounds its operands,
  3.7e-3 max rel measured on-chip 2026-08-18, tools/debug_epilogue_tpu.py);
- z rows -> lanes via unaligned lane-slice concat; weights back via
  per-row unaligned lane-slice stores;
- transmittance = segmented exclusive cumprod: log2(S) masked doubling
  shifts (the in-kernel twin of core/scan_ops.cumprod_last);
- per-ray sums = one [C, N] x [N, R_blk] one-hot dot, kept at default
  precision: its bf16 product rounding lands on the FINAL output maps (the
  historical ~4e-3 p50 parity floor) and changing it would break the
  eval==train maps bit-equality contract.

Parity: the composite math is ``core/render.volumetric_render`` exactly
(reference ``models/renderer.py:21-85``): +1e-10 transmittance floor, 1e10
far-padding of dists, |d| scaling, vacancy-depth + disp computed OUTSIDE on
the tiny per-ray maps. Eval-only (raw_noise_std == 0; no VJP) — training
keeps the composite-outside path.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfsos_tpu.ops.pallas.fused_field import (
    _flatten_mlp_params,
    _mm_pl,
    _pe_consts_pl,
    _pe_in_kernel_pl,
)

# Rays per grid step (N_blk = RAY_BLOCK * S points through the MLP per step).
# None = adaptive: target ~4608 points per block (fine S=192 -> 24 rays,
# coarse S=64 -> 72) — measured 388.1k vs 385.3k (3072) vs 378.9k (fixed 8)
# rays/s in the same session (tools/perf_eval_block24.py); the remote
# compiler rejects ~6144-point blocks (R_blk=32 at S=192).
RAY_BLOCK: Optional[int] = None
_EVAL_TARGET_N = 4608

# How the exact per-ray -> per-point broadcasts are lowered:
#   "split"   — ONE default-precision one-hot dot over exact 3-way bf16
#               operand splits (hi+mid+lo reproduces the f32 mantissa
#               exactly; a default-precision Mosaic dot only bf16-rounds its
#               operands, which is a no-op on already-bf16-representable
#               values, and one-hot products accumulate exactly in f32).
#               Bit-equal to "highest" by construction at ~1/6 the MXU
#               passes per block — the round-3 eval epilogue gap (padded
#               util 0.876 vs train's 0.962) was dominated by these
#               multi-pass HIGHEST micro-dots repeated every grid step.
#   "highest" — the round-3 lowering: separate precision=HIGHEST dots
#               (kept for on-chip A/B; tools/perf_bcast_split.py).
_BCAST_MODE = "split"

# How the volumetric composite is computed:
#   "lanes" — DEFAULT: the round-3 lane-major segmented form ([1, R_blk*S]
#             vectors, Hillis-Steele doubling scans with segment masks).
#             This is the configuration every shipped gate was validated
#             on (REHEARSAL_r03, PROTOCOL_r04, BENCH numbers).
#   "rows"  — ray-per-sublane-row ([R_blk, S] blocks): full 8-sublane VPU
#             occupancy for the scans/exp chains (6 vregs/op at the
#             flagship eval shape vs 36 lane-major), mask-free scans, ONE
#             aligned weights block store. BIT-equal to "lanes" per
#             element (the doubling tree restricted to one segment IS the
#             plain per-row tree; inputs match bit-for-bit — verified on
#             chip for every kernel family, tools/perf_composite_rows.py).
#             MEASURED ON CHIP 2026-08-19 (/tmp/rows_ab.log, ABAB): eval
#             render 434.3k vs 434.2k rays/s, rgb-train grads 82.1 vs
#             82.1 ms, mip train 103.9 vs 103.9 ms — ZERO delta. The
#             "composite scans dominate the eval padded-util gap"
#             hypothesis (VERDICT r3 #1 / ROUND3_NOTES ceiling section) is
#             DISPROVEN: the epilogue's VPU time was already hidden under
#             the MXU passes. Kept for A/B; see ROUND4_NOTES "#1 ...
#             epilogue floor" for the full accounting.
_COMPOSITE_MODE = "lanes"


def _eval_ray_block(s: int) -> int:
    if RAY_BLOCK is not None:
        return RAY_BLOCK
    return max(8, (_EVAL_TARGET_N // (8 * s)) * 8)


def _seg_ids(n: int, s: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ray id, sample id) per lane for N = R_blk * S ray-major points."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return pos // s, pos % s


def _rows_to_lanes(ref, r_blk: int, s: int) -> jnp.ndarray:
    """[R_blk, S] VMEM block -> [1, R_blk*S] lanes (ray-major)."""
    return jnp.concatenate([ref[r:r + 1, :] for r in range(r_blk)], axis=1)


def _lanes_to_rows(flat: jnp.ndarray, r_blk: int, s: int) -> jnp.ndarray:
    """[1, R_blk*S] lanes (ray-major) -> [R_blk, S] rows; inverse of
    _rows_to_lanes (same per-row unaligned lane slices, stacked on
    sublanes — the lane<->sublane *reshape* Mosaic can't do directly).

    INTERPRET/CPU ONLY as a value op: on chip, tpu.concatenate refuses value
    slices whose lane offsets differ ("result/input offset mismatch on
    non-concat dimension" — S % 128 != 0 makes the offsets alternate 0/64;
    found on-chip round 4). Kernels use _lanes_to_rows_vmem instead."""
    return jnp.concatenate([flat[:, r * s:(r + 1) * s] for r in range(r_blk)],
                           axis=0)


def _lanes_to_rows_vmem(flat: jnp.ndarray, scratch_ref, r_blk: int,
                        s: int) -> jnp.ndarray:
    """[1, R_blk*S] -> [R_blk, S] THROUGH VMEM: per-row lane-slice stores
    (the proven _store_rows pattern) then ONE aligned block load — the
    store/load round-trip does the lane->sublane relayout in hardware that
    tpu.concatenate on values can't (see _lanes_to_rows)."""
    _store_rows(scratch_ref, flat, r_blk, s)
    return scratch_ref[:]


def _rows_to_lanes_vmem(rows: jnp.ndarray, scratch_ref, r_blk: int,
                        s: int) -> jnp.ndarray:
    """[R_blk, S] VALUE -> [1, R_blk*S] through VMEM: one aligned block
    store, then the per-row lane-slice REF loads of _rows_to_lanes (the
    form Mosaic compiles; value slices hit the same concatenate limit as
    _lanes_to_rows in the other direction)."""
    scratch_ref[:] = rows
    return _rows_to_lanes(scratch_ref, r_blk, s)


def _bcast_masks(r_blk: int, s: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HOST-side one-hot mask pair threaded into the kernels as inputs.

    ``onehot [r_blk, N]``: onehot[r, p] = 1 iff p // s == r — per-ray ->
    per-point broadcast via ``_bcast_dot``. ``seg [N, r_blk]``: its transpose
    — per-point -> per-ray sums via the maps dot (kept in the ORIGINAL
    contraction form so the MXU accumulation order, and therefore the
    eval==train maps bit-equality, is unchanged). Passing both as inputs with
    constant index maps builds them once per program instead of ~1.7k
    vreg-ops of iota/compare/convert per grid step."""
    n = r_blk * s
    rid = jnp.arange(n, dtype=jnp.int32) // s
    onehot = (jnp.arange(r_blk, dtype=jnp.int32)[:, None]
              == rid[None, :]).astype(jnp.float32)
    return onehot, onehot.T


def _eye_pl(k: int) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i == j).astype(jnp.float32)


def _transpose_small_pl(a: jnp.ndarray) -> jnp.ndarray:
    """[r, c] -> [c, r] via an exact one-hot f32 contraction.

    Mosaic cannot reshape/transpose across the lane/sublane boundary
    in-kernel (remote-compiler crash, probed 2026-08-17); a dot against the
    identity in the tm contraction form (dims (1,),(1,)) works — but ONLY at
    ``precision=HIGHEST``: Mosaic's default-precision f32 dot bf16-rounds
    its operands on the way into the MXU (max rel 3.7e-3 == 2^-8, measured
    on-chip 2026-08-18, tools/debug_epilogue_tpu.py probe A; interpret mode
    is exact and hides it). These outputs feed the PE trig phases, where
    bf16 position rounding is radians of phase error — HIGHEST's multi-pass
    f32 lowering measured exactly 0.0 rel on-chip (probe E)."""
    return jax.lax.dot_general(_eye_pl(a.shape[1]), a.astype(jnp.float32),
                               (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _bcast_dot(rows: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """[C, r_blk] per-ray rows -> [C, N] per-point via the one-hot dot.

    Exact fp32 — but only at ``precision=HIGHEST``: the default-precision
    Mosaic f32 dot bf16-rounds operands into the MXU (3.7e-3 max rel
    on-chip, tools/debug_epilogue_tpu.py probe B), and these outputs feed
    the PE trig phases where that is radians of phase error. The wd
    contraction form (dims (1,),(0,)); NOT a direct dot on the [R_blk, C]
    input block: that [R_blk,C]^T[R_blk,N] contract-dim-0 form MISCOMPILES
    on this toolchain (fixed-z parity 0.7-1.0 rel on-chip while CPU
    interpret passes — probed 2026-08-17); transpose via
    _transpose_small_pl first. Replaces r_blk * C masked madds on
    1-of-8-sublane [1, N] vectors (~2.2k vreg-ops per 4608-pt eval block)
    with a few MXU passes."""
    return jax.lax.dot_general(rows, onehot, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _split3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """f32 -> concat([hi, mid, lo], axis): three EXACTLY-bf16-representable
    f32 terms with x == hi + mid + lo bit-exactly.

    hi = RN_bf16(x) agrees with x in the top bits, so r1 = x - hi is exact
    in f32 (Sterbenz); mid = RN_bf16(r1) likewise leaves an exact residual
    with <= 8 significant bits, which IS a bf16 value. Three 8-bit mantissa
    segments cover the 24-bit f32 mantissa. This is the operand form that
    makes a DEFAULT-precision Mosaic dot exact: default only bf16-rounds
    operands on the way into the MXU (a no-op here) and accumulates the
    products in f32."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r1 = x - hi
    mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r1 - mid
    return jnp.concatenate([hi, mid, lo], axis=axis)


def _sum3(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Inverse of a row-axis _split3 after a linear op: rows [3c, ...]
    (hi|mid|lo groups of c) -> [c, ...] exact f32 sums (non-overlapping
    mantissa segments add exactly)."""
    return x[0:c] + x[c:2 * c] + x[2 * c:3 * c]


def _dot_default(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """Default-precision f32 dot (ONE MXU pass; bf16-rounds operands — exact
    when both operands are bf16-representable, e.g. _split3 outputs, one-hot
    masks, identity matrices)."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _transpose_bcast_exact(rows_blk: jnp.ndarray, oh: jnp.ndarray,
                           ) -> jnp.ndarray:
    """[r_blk, C] f32 block -> EXACT per-point broadcast [C, N] in TWO
    default-precision MXU passes (vs ~12+ HIGHEST passes for the separate
    transpose + broadcast dots of the round-3 lowering).

    Split the rows into exact bf16 thirds on the lane axis, transpose the
    [r_blk, 3C] block with one default-precision identity dot (operands all
    bf16-representable -> exact), broadcast the split rows with one
    default-precision one-hot dot, and re-sum the thirds on [C, N]."""
    c = rows_blk.shape[1]
    sp = _split3(rows_blk.astype(jnp.float32), axis=1)      # [r_blk, 3C]
    t = _dot_default(_eye_pl(3 * c), sp, ((1,), (1,)))       # [3C, r_blk]
    return _sum3(_dot_default(t, oh, ((1,), (0,))), c)       # [C, N]


def _bcast_epilogue(blocks, oh, cd, dirs_cols=None, mt_dirs_ref=None,
                    ph_dirs_ref=None):
    """The whole per-ray -> per-point epilogue in TWO default-precision MXU
    passes (all blocks share one transpose dot and one broadcast dot).

    blocks: list of [r_blk, Ci] row blocks to broadcast EXACTLY (operands
    enter the dots as exact bf16 thirds — see _split3). ``dirs_cols``
    (c0, c1): viewdir columns of blocks[0]; their per-ray values are
    reassembled exactly from the transpose, run through the dirs PE, and the
    resulting demb rides the same broadcast dot — rounded to cd by the dot
    itself when cd is bf16 (bit-equal to HIGHEST-then-astype(bf16)), or
    split exactly when cd is f32.

    Returns (per_point list [Ci, N] f32 exact, demb [Fd, N] cd or None).
    """
    def pad8(b, axis):
        # Pad to a multiple of 8 so every hi/mid/lo group (and therefore
        # every _sum3 operand slice) starts at sublane offset 0 — slices at
        # odd sublane offsets feed the composite scans' shift-concats, where
        # Mosaic hits "result/input offset mismatch on non-concat dimension"
        # (remote-compiler probe, 2026-08-19).
        c = b.shape[axis]
        p = (-c) % 8
        if not p:
            return b
        shape = list(b.shape)
        shape[axis] = p
        return jnp.concatenate([b, jnp.zeros(shape, b.dtype)], axis=axis)

    ws = [b.shape[1] for b in blocks]
    wps = [w + ((-w) % 8) for w in ws]
    sp = jnp.concatenate([_split3(pad8(b.astype(jnp.float32), 1), axis=1)
                          for b in blocks], axis=1)
    w_tot = sp.shape[1]
    t = _dot_default(_eye_pl(w_tot), sp, ((1,), (1,)))       # [3*Wp, r_blk]
    rows = [t]
    fd = 0
    fd_true = 0
    if dirs_cols is not None:
        c0, c1 = dirs_cols
        w0 = wps[0]
        v3 = t[c0:c1] + t[w0 + c0:w0 + c1] + t[2 * w0 + c0:2 * w0 + c1]
        demb_r = _pe_in_kernel_pl(v3, mt_dirs_ref[:], ph_dirs_ref[:])
        fd_true = demb_r.shape[0]
        demb_p = pad8(demb_r, 0)
        fd = demb_p.shape[0]
        rows.append(demb_p if cd == jnp.bfloat16 else _split3(demb_p, axis=0))
    big = _dot_default(jnp.concatenate(rows, axis=0) if len(rows) > 1 else t,
                       oh, ((1,), (0,)))                # [3*Wp (+Fd|3Fd), N]
    outs, off = [], 0
    for w, wp in zip(ws, wps):
        outs.append(_sum3(big[off:off + 3 * wp], wp)[:w])
        off += 3 * wp
    demb = None
    if dirs_cols is not None:
        tail = big[off:]
        demb = (tail[:fd] if cd == jnp.bfloat16
                else _sum3(tail, fd))[:fd_true].astype(cd)
    return outs, demb


def _seg_cumprod_excl(x: jnp.ndarray, sid: jnp.ndarray, s: int) -> jnp.ndarray:
    """Per-segment EXCLUSIVE product along lanes (first element 1).

    Formulation validated on-chip by tools/probe_lane_ops.py: seed with the
    right-shifted sequence (segment heads reset to the identity), then
    Hillis-Steele doubling with a same-segment mask.
    """
    one = jnp.ones((1, 1), x.dtype)
    v = jnp.where(sid >= 1,
                  jnp.concatenate([one, x[:, :-1]], axis=1), 1.0)
    k = 1
    while k < s:
        sh = jnp.concatenate([jnp.ones((1, k), x.dtype), v[:, :-k]], axis=1)
        v = v * jnp.where(sid >= k + 1, sh, 1.0)
        k *= 2
    return v


def _weights_from_sigma(sigma, z_flat, d3, sid, s: int):
    """Quadrature weights on the lane axis (math of render.sigma_to_weights).

    Delegates to _composite_lane so the eval and train kernels are BIT-equal
    (an earlier `1 - alpha + 1e-10` here differed from the train kernel's
    `e + 1e-10` by one ulp and broke the fine-maps bit-equality contract).
    """
    _, _, _, w, _, _ = _composite_lane(sigma, z_flat, d3, sid, s)
    return w


def _store_rows(out_ref, flat: jnp.ndarray, r_blk: int, s: int) -> None:
    """[1, R_blk*S] lanes -> [R_blk, S] VMEM block (per-row lane slices)."""
    for r in range(r_blk):
        out_ref[r, :] = flat[0, r * s:(r + 1) * s]


def _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd):
    h = emb
    for i in range(depth):
        k = next(it)
        h = jnp.maximum(_mm_pl(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=0)
    return h


def _render_kernel(
    odv_ref, z_ref, oh_ref, seg_ref,
    mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, r_blk: int, s: int,
):
    """One ray block: build points -> planar MLP -> composite -> maps.

    Outputs: maps [R_blk, 5 + sem_dim] columns = (w·sigmoid(rgb) x3, w·z,
    w(=acc) [, w·sem x sem_dim]) and weights [R_blk, S].

    Epilogue structure (round-3 close+): the per-ray -> per-point broadcast
    rides exact one-hot dots (see _bcast_dot) and the viewdirs PE is computed
    at PER-RAY width then broadcast — sin() on [F, r_blk] instead of [F, N]
    lanes. Bit-identical to the madd/per-point formulation (same values into
    the same ops); measured ~1.22x eval throughput at the flagship shape.
    """
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    maps_ref, wout_ref = refs[2 * n_w], refs[2 * n_w + 1]
    cd = compute_dtype
    n = r_blk * s

    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    if _BCAST_MODE == "split":
        (od9,), demb = _bcast_epilogue([odv_ref[:]], oh, cd, dirs_cols=(6, 9),
                                       mt_dirs_ref=mt_dirs_ref,
                                       ph_dirs_ref=ph_dirs_ref)
        od6 = od9[0:6]
    z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)      # [1, N]
    if _BCAST_MODE != "split":
        odv_t = _transpose_small_pl(odv_ref[:])  # [9, r_blk], exact
        od6 = _bcast_dot(odv_t[0:6], oh)         # [6, N], exact
    d3 = od6[3:6]
    pts = od6[0:3] + d3 * z_flat

    emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    h = _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])  # [1, N] fp32

    sem = None
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
        sl = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)
        sem = _mm_pl(sl, w_refs[k_s1][:], b_refs[k_s1][:])  # [sem, N] fp32

    if _BCAST_MODE != "split":
        # viewdirs are per-ray constants: PE at [F, r_blk], broadcast after
        # (exact — the sin inputs per point are identical either way).
        demb_r = _pe_in_kernel_pl(odv_t[6:9], mt_dirs_ref[:], ph_dirs_ref[:])
        demb = _bcast_dot(demb_r, oh).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv = jnp.maximum(_mm_pl(jnp.concatenate([feat, demb], axis=0),
                            w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])  # [3, N] fp32

    # ---- composite (all fp32 VPU) ----------------------------------------
    if _COMPOSITE_MODE == "rows":
        scr_ref = refs[2 * n_w + 2]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        _, _, _, w_rows, _, _, _ = _composite_rows(sig_rows, z_ref[:],
                                                   odv_ref[:, 3:6], r_blk, s)
        # park w in the weights OUTPUT block, read back per-row lane slices
        # (the only Mosaic-legal rows->lanes form — see _rows_to_lanes_vmem)
        wout_ref[:] = w_rows
        w = _rows_to_lanes(wout_ref, r_blk, s)  # [1, N] for the vals products
    else:
        w = _weights_from_sigma(sigma, z_flat, d3, sid, s)  # [1, N]
    rgb = jax.nn.sigmoid(rgb_logits)
    rows = [w * rgb, w * z_flat, w]
    if use_semantics:
        rows.append(w * sem.astype(jnp.float32))
    vals = jnp.concatenate(rows, axis=0)  # [5 + sem, N]

    # maps as [R_blk, C] directly (transposed contraction — a [C, R_blk]
    # output block would have a non-128-divisible lane dim). Mosaic f32 x f32
    # dots are exact (no XLA default-precision bf16 rounding).
    maps_ref[:] = jax.lax.dot_general(seg_ref[:], vals, (((0,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    if _COMPOSITE_MODE != "rows":
        _store_rows(wout_ref, w, r_blk, s)


def _sigma_weights_kernel(
    od_ref, z_ref, oh_ref, mt_pts_ref, ph_pts_ref, *refs,
    depth: int, skips: Tuple[int, ...], compute_dtype, r_blk: int, s: int,
):
    """Coarse pass for eval: density trunk only -> quadrature weights block.

    Replaces fused_sigma_apply + XLA sigma_to_weights: the [3, N] point
    stream, the sigma round-trip, and their relayouts never touch HBM.
    """
    n_w = depth + 1
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    wout_ref = refs[2 * n_w]
    cd = compute_dtype
    n = r_blk * s

    _, sid = _seg_ids(n, s)
    if _BCAST_MODE == "split":
        (od6,), _ = _bcast_epilogue([od_ref[:]], oh_ref[:], cd)
    else:
        od6 = _bcast_dot(_transpose_small_pl(od_ref[:]), oh_ref[:])  # [6, N]
    z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)
    d3 = od6[3:6]
    pts = od6[0:3] + d3 * z_flat

    emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
    h = emb
    for i in range(depth):
        h = jnp.maximum(_mm_pl(h, w_refs[i][:], b_refs[i][:]), 0.0).astype(cd)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=0)
    sigma = _mm_pl(h, w_refs[depth][:], b_refs[depth][:])  # [1, N] fp32

    if _COMPOSITE_MODE == "rows":
        scr_ref = refs[2 * n_w + 1]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        _, _, _, w_rows, _, _, _ = _composite_rows(sig_rows, z_ref[:],
                                                   od_ref[:, 3:6], r_blk, s)
        wout_ref[:] = w_rows
    else:
        w = _weights_from_sigma(sigma, z_flat, d3, sid, s)
        _store_rows(wout_ref, w, r_blk, s)


def _pad_rays(arrs_rows, z, r_blk):
    """Pad ray count to a multiple of r_blk (edge-ray replication)."""
    R = z.shape[0]
    pad = (-R) % r_blk
    if pad:
        arrs_rows = [jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
            for a in arrs_rows]
        z = jnp.concatenate([z, jnp.broadcast_to(z[-1:], (pad,) + z.shape[1:])], 0)
    return arrs_rows, z, R, pad


def fused_render_planar(params: Dict[str, Any], odv: jnp.ndarray,
                        z_vals: jnp.ndarray, cfg, depth: Optional[int] = None,
                        interpret: Optional[bool] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused field+composite render of one pass.

    Args:
      odv:    [R, 9] columns = rays_o, rays_d (unnormalized), viewdirs
              (rays on sublanes: a 9-lane column block is legal, an
              R_blk-lane one is not).
      z_vals: [R, S] sample depths (sorted per ray).
    Returns:
      (maps [R, 5 + sem_dim] — w·sigmoid(rgb) x3, w·z, acc [, w·sem...];
       weights [R, S]).
    Eval-only: no VJP, raw_noise_std must be 0 at the call site.
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, cfg.use_semantics)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _eval_ray_block(S)
    (odv,), z_vals, R, pad = _pad_rays([odv], z_vals, r_blk)
    n_blocks = z_vals.shape[0] // r_blk

    ws = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _pe_consts_pl(cfg.multires, cfg.multires_views)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_maps = 5 + (ws[-1].shape[-1] if cfg.use_semantics else 0)
    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    maps, weights = pl.pallas_call(
        functools.partial(
            _render_kernel, depth=depth, skips=(4,),
            use_semantics=cfg.use_semantics, sem_with_coord=cfg.sem_with_coord,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs_col],
        ],
        out_specs=[
            pl.BlockSpec((r_blk, n_maps), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r_blk, n_maps), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * r_blk, S), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odv, z_vals, onehot, seg, *pe_args, *ws, *bs_col)
    if pad:
        maps, weights = maps[:R], weights[:R]
    return maps, weights


def fused_coarse_weights_planar(params: Dict[str, Any], od: jnp.ndarray,
                                z_vals: jnp.ndarray, cfg,
                                depth: Optional[int] = None,
                                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Coarse eval pass: od [R, 6] (o, d columns), z [R, S] -> weights [R, S]."""
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    names = [f"pts_linears_{i}" for i in range(depth)] + ["alpha_linear"]
    ws = tuple(mlp[n]["kernel"] for n in names)
    bs = tuple(mlp[n]["bias"] for n in names)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _eval_ray_block(S)
    (od,), z_vals, R, pad = _pad_rays([od], z_vals, r_blk)
    n_blocks = z_vals.shape[0] // r_blk

    ws = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _pe_consts_pl(cfg.multires)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, _ = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    weights = pl.pallas_call(
        functools.partial(
            _sigma_weights_kernel, depth=depth, skips=(4,),
            compute_dtype=compute_dtype, r_blk=r_blk, s=S),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 6), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs_col],
        ],
        out_specs=pl.BlockSpec((r_blk, S), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((z_vals.shape[0], S), jnp.float32),
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(od, z_vals, onehot, *pe_args, *ws, *bs_col)
    return weights[:R] if pad else weights


def finish_maps(maps: jnp.ndarray, weights: jnp.ndarray, use_semantics: bool,
                white_bkgd: bool) -> Dict[str, jnp.ndarray]:
    """Per-ray finishing on the tiny [R, C] maps: vacancy depth, disp,
    white background — the tail of render.volumetric_render."""
    rgb_map = maps[:, 0:3]
    depth_map = maps[:, 3:4]
    acc_map = maps[:, 4:5]
    depth_map = jnp.where(acc_map <= 1e-10, 1e10, depth_map)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    out = dict(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights,
               depth=depth_map)
    if use_semantics:
        sem_map = maps[:, 5:]
        if white_bkgd:
            sem_map = sem_map + (1.0 - acc_map)
        out["semantics"] = sem_map
    if white_bkgd:
        out["rgb"] = rgb_map + (1.0 - acc_map)
    return out


# ---------------------------------------------------------------------------
# TRAINING: fused render with a fused backward.
#
# custom_vjp over the MLP weights/biases only — odv and z receive exact-zero
# cotangents, which is correct for every shipped trainer: rays are data and
# the importance z-values are detached (the same contract as
# ``fused_field_apply_planar`` / cfg.field_input_grads=False).
#
# raw_noise_std: the reference draws torch N(0,1) per sample pre-relu
# (models/renderer.py:44-46). Here the noise is a counter-based hash
# (SplitMix-style mixing + Box-Muller) seeded from the step key: identical
# in the forward and backward kernels by construction (same seed operand,
# same lane indices), portable between Mosaic and interpret mode. The DRAWS
# differ from jax.random's threefry — allowed: the reference contract is the
# distribution, not the stream (torch's stream differs too).
# ---------------------------------------------------------------------------

TRAIN_RAY_BLOCK: Optional[int] = None
# Adaptive rays/block for the train kernels: target ~1024 points per block.
# Measured (tools/perf_train_block_sweep.py, one v5e): fine S=192 prefers 8
# rays (1536 pts; 16/24 are slower), coarse S=64 prefers 16 rays (1024 pts:
# grad path 62.3 -> 58.0 ms at R=32768; 48 rays regresses). The bwd VMEM
# stack scales with pts/block, so the target stays at/below the fine pass's
# proven 1536.
_TRAIN_TARGET_N = 1024

# Mip eval kernel's point-block target (see fused_mip_render_planar): the
# in-kernel Gaussian + IPE build is VPU/VMEM-heavier than the classic kernel,
# so its measured optimum is smaller than _EVAL_TARGET_N.
_MIP_TARGET_N = 1536

# Mip eval Gaussian source (VERDICT r4 #4 counter-hypothesis A/B):
#   "kernel" — conical-frustum Gaussian (+ composite D, mids) built in-kernel
#              on the VPU per point (_mip_gauss_lane), the round-3/4 design;
#   "stream" — XLA precomputes the identical math (_mip_gauss_planar_xla) and
#              streams it as one block-major [n_blocks, 8, N_blk] f32 operand
#              (mean3, cov3, mids, D): trades ~32 B/pt of HBM traffic for the
#              Gaussian-build VPU prologue. Measured on-chip 2026-08-20:
#              bit-equal; at ITS block optimum (4608 — streaming lifts the
#              VMEM-residency cap that forced the in-kernel build to 1536)
#              lands exactly on kernel-mode's 43.1 ms floor. Zero delta.
#   "ipe"    — XLA additionally precomputes the WHOLE integrated-PE embedding
#              (the exact _ipe_in_kernel_pl math) and streams it at
#              compute_dtype [n_blocks, 2FD, N_blk] + (mids, D) f32: removes
#              every in-kernel transcendental (exp/sin), ~2 B/pt/row traffic
#              — the last prologue counter-hypothesis.
# A/B: tools/perf_mip_stream.py; parity: tests/test_mip.py.
_MIP_GAUSS_MODE = "kernel"


# Frozen (--fix_backbone) steps use a larger ray block than the full train
# path: the round-3 1024-pt target was swept against the FULL backward (every
# layer's dW accumulator VMEM-resident); the frozen composition (fwd stores
# the sem_in residual, bwd holds two weight pairs) measures best at 16 rays
# on BOTH passes — flagship SOS step 128.0 -> 125.3 ms (+2.2%), rb32 slower
# (tools/perf_frozen_blk.py, 2026-08-20 same-session). Note the in-kernel
# noise seeds per (block, lane): a different block partition draws different
# (still iid) noise — same documented class as the sharded fold_in(shard)
# draws; the grads-vs-full-backward bit-equality test pins a common block.
_FROZEN_RAY_BLOCK = 16


def _train_ray_block(s: int, frozen: bool = False) -> int:
    if TRAIN_RAY_BLOCK is not None:
        return TRAIN_RAY_BLOCK
    if frozen:
        return _FROZEN_RAY_BLOCK
    return max(8, (_TRAIN_TARGET_N // (8 * s)) * 8)


def _seg_rev_cumsum_excl(u: jnp.ndarray, sid: jnp.ndarray, s: int) -> jnp.ndarray:
    """Per-segment reverse EXCLUSIVE sum along lanes: out_j = sum_{n>j} u_n
    (within the segment; last element 0). Mirror of _seg_cumprod_excl."""
    zero = jnp.zeros((1, 1), u.dtype)
    v = jnp.where(sid <= s - 2,
                  jnp.concatenate([u[:, 1:], zero], axis=1), 0.0)
    k = 1
    while k < s:
        sh = jnp.concatenate([v[:, k:], jnp.zeros((1, k), u.dtype)], axis=1)
        v = v + jnp.where(sid <= s - 2 - k, sh, 0.0)
        k *= 2
    return v


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """SplitMix32-style avalanche on int32 lanes (wrap-around multiplies;
    LOGICAL right shifts — Mosaic has no uint32 casts, and int32 >> is
    arithmetic)."""
    srl = jax.lax.shift_right_logical
    x = x ^ srl(x, 16)
    x = x * jnp.int32(0x7FEB352D)
    x = x ^ srl(x, 15)
    x = x * jnp.int32(-2064850293)  # 0x846CA68B as int32
    x = x ^ srl(x, 16)
    return x


def _noise_lanes(seed_f32, pid, n: int, std: float) -> jnp.ndarray:
    """Deterministic N(0, std) per GLOBAL lane via hash + Box-Muller.

    seed_f32: SMEM scalar (f32 carrying an integer — f32 so the custom_vjp
    cotangent is an ordinary zero, not a float0)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    base = seed_f32.astype(jnp.int32) + pid * jnp.int32(n)
    h1 = _mix32((idx + base) * jnp.int32(-1640531527))  # 2654435761 wrapped
    h2 = _mix32(h1 + jnp.int32(0x7E3779B9))
    srl = jax.lax.shift_right_logical
    u1 = srl(h1, 8).astype(jnp.float32) * (2.0 ** -24)  # [0, 1)
    u2 = srl(h2, 8).astype(jnp.float32) * (2.0 ** -24)
    r = jnp.sqrt(-2.0 * jnp.log1p(-u1))  # log1p: exact near u1=0
    return (std * r) * jnp.cos((2.0 * 3.14159265358979) * u2)


def _composite_lane(sigma, z_flat, d3, sid, s: int):
    """alpha/y/T/w plus the terms the backward reuses."""
    z_next = jnp.concatenate([z_flat[:, 1:], jnp.zeros((1, 1), z_flat.dtype)],
                             axis=1)
    dists = jnp.where(sid == s - 1, 1e10, z_next - z_flat)
    norm_d = jnp.sqrt(d3[0:1] ** 2 + d3[1:2] ** 2 + d3[2:3] ** 2)
    D = dists * norm_d
    e = jnp.exp(-jnp.maximum(sigma, 0.0) * D)  # = 1 - alpha
    alpha = 1.0 - e
    y = e + 1e-10  # 1 - alpha + 1e-10
    T = _seg_cumprod_excl(y, sid, s)
    return alpha, y, T, alpha * T, e, D


def _cumprod_excl_rows(y: jnp.ndarray, s: int) -> jnp.ndarray:
    """Per-ROW exclusive product along lanes: the row-major twin of
    _seg_cumprod_excl. No masks: the shifted-in ones already are the
    identity at the row head, and multiplying by 1.0 is bit-exact — the
    doubling tree per element is identical to the segmented form's."""
    r = y.shape[0]
    v = jnp.concatenate([jnp.ones((r, 1), y.dtype), y[:, :-1]], axis=1)
    k = 1
    while k < s:
        v = v * jnp.concatenate([jnp.ones((r, k), y.dtype), v[:, :-k]], axis=1)
        k *= 2
    return v


def _rev_cumsum_excl_rows(u: jnp.ndarray, s: int) -> jnp.ndarray:
    """Per-ROW reverse exclusive sum along lanes (last element 0): the
    row-major twin of _seg_rev_cumsum_excl (same doubling tree; shifted-in
    zeros replace the segment masks)."""
    r = u.shape[0]
    v = jnp.concatenate([u[:, 1:], jnp.zeros((r, 1), u.dtype)], axis=1)
    k = 1
    while k < s:
        v = v + jnp.concatenate([v[:, k:], jnp.zeros((r, k), u.dtype)], axis=1)
        k *= 2
    return v


def _composite_rows(sig, z_rows, d_cols, r_blk: int, s: int):
    """Row-major volumetric composite: [R_blk, S] blocks, rays on sublanes,
    samples on lanes (reference models/renderer.py:21-85 semantics — 1e10
    far-padded dists, |d| scaling, e + 1e-10 transmittance floor).

    BIT-equal to _composite_lane per element: same op tree per ray (see
    _cumprod_excl_rows), and the inputs match bit-for-bit — sig is the
    VMEM-round-tripped row layout of the same sigma values (exact copies),
    z comes from the same [R_blk, S] block, and norm_d from the odv columns
    equals the per-point broadcast (exact).

    Args: sig [R_blk, S] sigma rows (callers convert via
    _lanes_to_rows_vmem). Returns (alpha, y, T, w, e, D, sig) all as
    [R_blk, S] rows — sig included because the backward's relu gate needs
    it in this layout.
    """
    lid = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    z = z_rows.astype(jnp.float32)
    z_next = jnp.concatenate([z[:, 1:], jnp.zeros((r_blk, 1), jnp.float32)], 1)
    dists = jnp.where(lid == s - 1, 1e10, z_next - z)
    d = d_cols.astype(jnp.float32)
    norm_d = jnp.sqrt(d[:, 0:1] ** 2 + d[:, 1:2] ** 2 + d[:, 2:3] ** 2)
    D = dists * norm_d
    e = jnp.exp(-jnp.maximum(sig, 0.0) * D)
    alpha = 1.0 - e
    y = e + 1e-10
    T = _cumprod_excl_rows(y, s)
    return alpha, y, T, alpha * T, e, D, sig


def _mip_composite_rows(sig, t0_rows, t1_rows, d_cols, r_blk: int, s: int):
    """Row-major twin of _mip_composite_lane (dists from fenceposts, NO far
    padding — reference models/renderer.py:98-152). Same bit-equality
    argument as _composite_rows; sig [R_blk, S] sigma rows (callers convert
    via _lanes_to_rows_vmem); t0/t1 are direct fencepost slices."""
    d = d_cols.astype(jnp.float32)
    norm_d = jnp.sqrt(d[:, 0:1] ** 2 + d[:, 1:2] ** 2 + d[:, 2:3] ** 2)
    D = (t1_rows - t0_rows) * norm_d
    e = jnp.exp(-jnp.maximum(sig, 0.0) * D)
    alpha = 1.0 - e
    y = e + 1e-10
    T = _cumprod_excl_rows(y, s)
    return alpha, y, T, alpha * T, e, D, sig


def _train_render_kernel(
    odv_ref, z_ref, seed_ref, oh_ref, seg_ref,
    mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, r_blk: int, s: int, noise_std: float,
    save_h: bool = False, save_semin: bool = False,
):
    """Forward of the fused TRAIN render: _render_kernel + pre-relu noise.

    ``save_h``: additionally store the trunk output h (compute dtype) for the
    frozen-backbone backward's stream_h mode (_FROZEN_BWD_MODE) — the stored
    value is exactly what that backward's recompute would produce.
    ``save_semin``: store the full sem-head input sem_in = [h; emb] instead
    (stream_semin mode) — the backward then streams its operand directly."""
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    maps_ref, wout_ref = refs[2 * n_w], refs[2 * n_w + 1]
    n_out = 2
    if save_h or save_semin:
        hout_ref = refs[2 * n_w + 2]
        n_out = 3
    cd = compute_dtype
    n = r_blk * s

    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    if _BCAST_MODE == "split":
        (od9,), demb = _bcast_epilogue([odv_ref[:]], oh, cd, dirs_cols=(6, 9),
                                       mt_dirs_ref=mt_dirs_ref,
                                       ph_dirs_ref=ph_dirs_ref)
        od6 = od9[0:6]
    else:
        odv_t = _transpose_small_pl(odv_ref[:])
        od6 = _bcast_dot(odv_t[0:6], oh)
    z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)
    d3 = od6[3:6]
    pts = od6[0:3] + d3 * z_flat

    emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    h = _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd)
    if save_h:
        hout_ref[0, :, :] = h

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])
    if noise_std > 0.0:
        sigma = sigma + _noise_lanes(seed_ref[0, 0], pl.program_id(0), n, noise_std)

    sem = None
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
        if save_semin:
            hout_ref[0, :, :] = sem_in
        sl = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)
        sem = _mm_pl(sl, w_refs[k_s1][:], b_refs[k_s1][:])

    if _BCAST_MODE != "split":
        demb_r = _pe_in_kernel_pl(odv_t[6:9], mt_dirs_ref[:], ph_dirs_ref[:])
        demb = _bcast_dot(demb_r, oh).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv = jnp.maximum(_mm_pl(jnp.concatenate([feat, demb], axis=0),
                            w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    if _COMPOSITE_MODE == "rows":
        scr_ref = refs[2 * n_w + n_out]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        _, _, _, w_rows, _, _, _ = _composite_rows(sig_rows, z_ref[:],
                                                   odv_ref[:, 3:6], r_blk, s)
        wout_ref[:] = w_rows
        w = _rows_to_lanes(wout_ref, r_blk, s)
    else:
        _, _, _, w, _, _ = _composite_lane(sigma, z_flat, d3, sid, s)
    rgb = jax.nn.sigmoid(rgb_logits)
    rows = [w * rgb, w * z_flat, w]
    if use_semantics:
        rows.append(w * sem.astype(jnp.float32))
    vals = jnp.concatenate(rows, axis=0)

    maps_ref[:] = jax.lax.dot_general(seg_ref[:], vals, (((0,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    if _COMPOSITE_MODE != "rows":
        _store_rows(wout_ref, w, r_blk, s)


def _train_render_bwd_kernel(
    odv_ref, z_ref, seed_ref, dmaps_ref, dwin_ref, oh_ref, seg_ref,
    mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, r_blk: int, s: int, noise_std: float,
    rgb_loss: bool = False, white_bkgd: bool = False,
):
    """Backward: recompute forward + composite, form the raw cotangents from
    the map/weight cotangents IN KERNEL, then the planar MLP reverse sweep
    (the dW/db accumulation pattern of fused_field._field_bwd_kernel_pl).

    ``rgb_loss=True`` is the 3x-FLOP RGB TRAIN mode (no separate forward
    pass at all): dmaps_ref/dwin_ref are reinterpreted as gt [R_blk, 3] /
    valid [R_blk, 1], the kernel computes the per-ray maps itself, forms the
    UNSCALED img2mse cotangent 2*(rgb_map - gt) in kernel (the caller
    multiplies the dW/db outputs by rgb_w/(R*3) — exact, the sweep is linear
    in the cotangent), and additionally outputs maps + weights for the
    metrics and the importance resampler."""
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    dw_refs = refs[2 * n_w:3 * n_w]
    db_refs = refs[3 * n_w:4 * n_w]
    if rgb_loss:
        maps_ref, wout_ref = refs[4 * n_w], refs[4 * n_w + 1]
    cd = compute_dtype
    n = r_blk * s

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    def tm(a, b):
        # cast both operands: Mosaic rejects mixed bf16 x f32 dots
        return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def wd(w, d):
        return jax.lax.dot_general(w.astype(cd), d.astype(cd),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def relu_bwd(act, d):
        return jnp.where(act.astype(jnp.float32) > 0, d, 0.0)

    # ---- forward recompute ------------------------------------------------
    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    dvals0 = None
    if _BCAST_MODE == "split":
        # In the map-cotangent mode dmaps is an input: its exact broadcast
        # rides the SAME two epilogue passes as o/d/viewdirs. (In rgb_loss
        # mode the cotangent is computed in-kernel later — own small pair.)
        blocks = [odv_ref[:]] if rgb_loss else [odv_ref[:], dmaps_ref[:]]
        outs, demb = _bcast_epilogue(blocks, oh, cd, dirs_cols=(6, 9),
                                     mt_dirs_ref=mt_dirs_ref,
                                     ph_dirs_ref=ph_dirs_ref)
        od6 = outs[0][0:6]
        if not rgb_loss:
            dvals0 = outs[1]
    else:
        odv_t = _transpose_small_pl(odv_ref[:])
        od6 = _bcast_dot(odv_t[0:6], oh)
    z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)
    d3 = od6[3:6]
    pts = od6[0:3] + d3 * z_flat

    emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    acts, ins = [], [emb]
    h = emb
    for i in range(depth):
        k = next(it)
        a = jnp.maximum(_mm_pl(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        acts.append(a)
        h = jnp.concatenate([emb, a], axis=0) if i in skips else a
        if i + 1 < depth:
            ins.append(h)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma0 = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])
    sigma = sigma0
    if noise_std > 0.0:
        sigma = sigma0 + _noise_lanes(seed_ref[0, 0], pl.program_id(0), n, noise_std)

    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
        s_act = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)
        sem = _mm_pl(s_act, w_refs[k_s1][:], b_refs[k_s1][:])

    if _BCAST_MODE != "split":
        demb_r = _pe_in_kernel_pl(odv_t[6:9], mt_dirs_ref[:], ph_dirs_ref[:])
        demb = _bcast_dot(demb_r, oh).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv_in = jnp.concatenate([feat, demb], axis=0)
    hv = jnp.maximum(_mm_pl(hv_in, w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    if _COMPOSITE_MODE == "rows":
        # ONE scratch, reused sequentially (each read materializes into
        # vregs before the next overwrite — kernel memory ops are ordered):
        # sigma->rows, w->lanes, dw->rows, d_sigma->lanes.
        scr_ref = refs[-1]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        alpha_r, y_r, T_r, w_rows, e_r, D_r, sig_r = _composite_rows(
            sig_rows, z_ref[:], odv_ref[:, 3:6], r_blk, s)
        w = _rows_to_lanes_vmem(w_rows, scr_ref, r_blk, s)
    else:
        alpha, y, T, w, e, D = _composite_lane(sigma, z_flat, d3, sid, s)
    rgb = jax.nn.sigmoid(rgb_logits)

    # ---- composite cotangents --------------------------------------------
    n_maps = 5 + (sem.shape[0] if use_semantics else 0)
    if rgb_loss:
        # compute the per-ray maps here (no separate forward exists)
        rows = [w * rgb, w * z_flat, w]
        if use_semantics:
            rows.append(w * sem.astype(jnp.float32))
        vals = jnp.concatenate(rows, axis=0)
        maps = jax.lax.dot_general(seg_ref[:], vals, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        maps_ref[:] = maps
        if _COMPOSITE_MODE == "rows":
            wout_ref[:] = w_rows
        else:
            _store_rows(wout_ref, w, r_blk, s)
        # unscaled img2mse cotangent, zeroed on padded rays (valid column)
        acc_col = maps[:, 4:5]
        rgbm = maps[:, 0:3] + ((1.0 - acc_col) if white_bkgd else 0.0)
        diff = 2.0 * (rgbm - dmaps_ref[:]) * dwin_ref[:]  # gt / valid refs
        zcol = jnp.zeros((r_blk, 1), jnp.float32)
        cols = [diff, zcol,
                -jnp.sum(diff, 1, keepdims=True) if white_bkgd else zcol]
        if use_semantics:
            cols.append(jnp.zeros((r_blk, sem.shape[0]), jnp.float32))
        dmaps_blk = jnp.concatenate(cols, axis=1)
        if _BCAST_MODE == "split":
            dvals = _transpose_bcast_exact(dmaps_blk, oh)
        else:
            dvals = _bcast_dot(_transpose_small_pl(dmaps_blk), oh)
    elif dvals0 is not None:
        dvals = dvals0  # exact broadcast from the shared epilogue passes
    else:
        dvals = _bcast_dot(_transpose_small_pl(dmaps_ref[:]), oh)  # [n_maps, N]
    dw = (dvals[0:1] * rgb[0:1] + dvals[1:2] * rgb[1:2] + dvals[2:3] * rgb[2:3]
          + dvals[3:4] * z_flat + dvals[4:5])
    if use_semantics:
        sem_f = sem.astype(jnp.float32)
        for c in range(sem.shape[0]):
            dw = dw + dvals[5 + c:6 + c] * sem_f[c:c + 1]
    d_rgb = (dvals[0:3] * w) * (rgb * (1.0 - rgb))  # sigmoid chain
    d_sem = dvals[5:] * w if use_semantics else None

    # w = alpha * T; T = prod_{j<i} y_j; y = 1 - alpha + 1e-10;
    # alpha = 1 - exp(-relu(sigma) * D)
    if _COMPOSITE_MODE == "rows":
        # the scans and the elementwise chain at full sublane occupancy;
        # dwin is ALREADY row-major — its lanes conversion disappears.
        dw_r = _lanes_to_rows_vmem(dw, scr_ref, r_blk, s)
        if not rgb_loss:
            dw_r = dw_r + dwin_ref[:].astype(jnp.float32)
        dalpha_r = dw_r * T_r
        dT_r = dw_r * alpha_r
        dy_r = _rev_cumsum_excl_rows(dT_r * T_r, s) / y_r
        dalpha_r = dalpha_r - dy_r
        d_sigma = _rows_to_lanes_vmem(
            jnp.where(sig_r > 0.0, dalpha_r * e_r * D_r, 0.0),
            scr_ref, r_blk, s)
    else:
        if not rgb_loss:
            dw = dw + _rows_to_lanes(dwin_ref, r_blk, s).astype(jnp.float32)
        dalpha = dw * T
        dT = dw * alpha
        dy = _seg_rev_cumsum_excl(dT * T, sid, s) / y
        dalpha = dalpha - dy
        d_sigma = jnp.where(sigma > 0.0, dalpha * e * D, 0.0)

    # ---- MLP reverse sweep (planar; mirrors _field_bwd_kernel_pl) --------
    d_rgb_c = d_rgb.astype(cd)
    dw_refs[k_rgb][:] += tm(hv, d_rgb_c)
    db_refs[k_rgb][:] += jnp.sum(d_rgb, 1, keepdims=True)
    dhv = relu_bwd(hv, wd(w_refs[k_rgb][:], d_rgb_c)).astype(cd)

    dw_refs[k_views][:] += tm(hv_in, dhv)
    db_refs[k_views][:] += jnp.sum(dhv.astype(jnp.float32), 1, keepdims=True)
    dhv_in = wd(w_refs[k_views][:], dhv)
    d_feat = dhv_in[:feat.shape[0], :].astype(cd)

    dw_refs[k_feat][:] += tm(h, d_feat)
    db_refs[k_feat][:] += jnp.sum(d_feat.astype(jnp.float32), 1, keepdims=True)
    dh = wd(w_refs[k_feat][:], d_feat)

    # single-output-lane dot pothole: pad the alpha cotangent to 2 rows
    d_alpha_c = d_sigma.astype(cd)
    d_alpha2 = jnp.concatenate([d_alpha_c, jnp.zeros_like(d_alpha_c)], axis=0)
    dw_refs[k_alpha][:] += tm(h, d_alpha2)[:, 0:1]
    db_refs[k_alpha][:] += jnp.sum(d_sigma, 1, keepdims=True)
    dh += wd(w_refs[k_alpha][:], d_alpha_c)

    if use_semantics:
        d_sem_c = d_sem.astype(cd)
        dw_refs[k_s1][:] += tm(s_act, d_sem_c)
        db_refs[k_s1][:] += jnp.sum(d_sem, 1, keepdims=True)
        ds = relu_bwd(s_act, wd(w_refs[k_s1][:], d_sem_c)).astype(cd)
        dw_refs[k_s0][:] += tm(sem_in, ds)
        db_refs[k_s0][:] += jnp.sum(ds.astype(jnp.float32), 1, keepdims=True)
        dsem_in = wd(w_refs[k_s0][:], ds)
        dh += dsem_in[:h.shape[0], :] if sem_with_coord else dsem_in

    dcur = dh
    for i in reversed(range(depth)):
        if i in skips:
            dcur = dcur[emb.shape[0]:, :]  # emb rows: input grads not needed
        dpre = relu_bwd(acts[i], dcur).astype(cd)
        dw_refs[i][:] += tm(ins[i], dpre)
        db_refs[i][:] += jnp.sum(dpre.astype(jnp.float32), 1, keepdims=True)
        dcur = wd(w_refs[i][:], dpre)


# Frozen-backward activation source (A/B: tools/perf_frozen_stream.py,
# tools/perf_frozen_semin.py):
#   "recompute" — the bwd kernel recomputes the 8-layer trunk forward to get
#                 the sem head's inputs (v1; no extra residual HBM);
#   "stream_h"  — the FORWARD kernel additionally stores the trunk output h
#                 (compute dtype, block-major [n_blocks, W, r_blk*S]) and the
#                 bwd streams it: BIT-identical (the stored h IS the value the
#                 recompute would produce — same kernel ops, same operands),
#                 trading ~W*2 B/pt of HBM round-trip for the trunk matmuls
#                 (~87% of the bwd's FLOPs at the flagship shape);
#   "stream_semin" — store the WHOLE sem-head input sem_in = [h; emb]
#                 ([W+2F+3 rows at sem_with_coord]): the bwd then needs no
#                 ray geometry at all — the od6 broadcast epilogue, the z
#                 relayout, and the in-kernel points PE (63 trig rows/pt, the
#                 "PE/dmaps prologue" in the v2 trace) all drop out, for
#                 +emb_rows*2 B/pt of stream (~0.8 GB at the flagship fine
#                 shape). Bit-identical: the stored rows ARE the values the
#                 stream_h bwd reassembles.
# Measured on-chip 2026-08-20 (tools/perf_frozen_stream.py /
# perf_frozen_semin.py, same-session, flagship SOS step): recompute 188.3 ms
# vs stream_h 140.1 ms (+34%); stream_h 142.1 ms vs stream_semin 130.0 ms
# (230.6k -> 252.0k rays/s, +9.3%) — post-update params bit-equal across all
# three. Residual-HBM note: the stream modes hold ~(width*2 B/pt) between
# fwd and bwd (~5.2 GB for sem_in at the flagship 32768-ray batch); batches
# that would exceed _FROZEN_STREAM_MAX_BYTES fall back to "recompute"
# automatically at trace time (_frozen_stream_mode).
_FROZEN_BWD_MODE = "stream_semin"

# Stream-mode residual budget: the stored h / sem_in costs ~width*2 B/pt of
# HBM held between fwd and bwd (~4-5 GB at the flagship 32768-ray batch).
# Shapes are static at trace time, so the forward falls back to "recompute"
# automatically when a batch would push the residual past this cap (16 GB
# chip; leave headroom for params/optimizer/activations of the rest of the
# step). The fallback is bit-equal — all three modes produce identical grads.
_FROZEN_STREAM_MAX_BYTES = 8 * 1024 ** 3


def _frozen_stream_mode(n_pts: int, width: int, itemsize: int) -> str:
    """Resolve _FROZEN_BWD_MODE for a concrete (static) shape."""
    mode = _FROZEN_BWD_MODE
    if mode != "recompute" and n_pts * width * itemsize > _FROZEN_STREAM_MAX_BYTES:
        return "recompute"
    return mode


def _train_frozen_bwd_kernel(
    odv_ref, z_ref, dmaps_ref, win_ref, oh_ref,
    mt_pts_ref, ph_pts_ref, *refs,
    depth: int, skips: Tuple[int, ...],
    sem_with_coord: bool, compute_dtype, r_blk: int, s: int,
    stream_h: bool = False, semin: bool = False,
):
    """Frozen-backbone backward: semantic-head dW/db ONLY.

    Reference semantics (``run_nerf.py:307-318``): with ``--fix_backbone``
    every param except ``semantic_linear`` has ``requires_grad=False``, so
    torch autograd NEVER BUILDS the trunk backward — its reverse sweep is
    just d(sem_map)/d(sem-head params) with the composite weights ``w`` as
    non-grad constants. This kernel is that sweep: recompute the trunk
    FORWARD (needed for the sem head's inputs; the alpha/feature/views/rgb
    heads, the dirs PE, the composite, and the whole trunk reverse sweep are
    all skipped), take ``w`` from the forward pass's weights OUTPUT
    (bit-identical to a recompute — same kernel ops on the same operands, and
    it carries the forward's noise draws for free), and accumulate only
    dW/db for sem_0/sem_1.

    Exactness vs the full backward's sem-head grads: ``dvals`` rides the same
    exact split-broadcast epilogue, ``w`` is the same value bitwise, and the
    two dW dots run on bit-identical operands in the same per-block grid
    order — the sem grads match the full kernel's bit-for-bit (asserted by
    tests/test_fused_render.py::test_frozen_backbone_grads_match_full).

    ``stream_h``: the trunk output h arrives STORED from the forward kernel
    (see _FROZEN_BWD_MODE) instead of being recomputed — refs then carry only
    the sem_0/sem_1 weight pairs plus the h operand. Bit-identical: the
    stored h IS the value the recompute produces.
    ``semin`` (implies stream_h): the stored operand is the FULL sem-head
    input sem_in = [h; emb] — no ray geometry enters the kernel at all (the
    od6 broadcast, the z relayout, and the points PE drop out; only the
    sem-map cotangent broadcast remains of the prologue). Bit-identical: the
    stored rows ARE the values the stream_h path reassembles.
    """
    if stream_h:
        h_ref = refs[0]
        w_refs, b_refs = refs[1:3], refs[3:5]
        dw_refs, db_refs = refs[5:7], refs[7:9]
        k_s0, k_s1 = 0, 1
    else:
        n_w = depth + 2  # trunk layers + sem_0 + sem_1
        w_refs = refs[:n_w]
        b_refs = refs[n_w:2 * n_w]
        dw_refs = refs[2 * n_w:2 * n_w + 2]
        db_refs = refs[2 * n_w + 2:2 * n_w + 4]
    cd = compute_dtype
    n = r_blk * s

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    def tm(a, b):
        return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    oh = oh_ref[:]
    if semin:
        # the forward stored sem_in whole: only the sem-map cotangent
        # broadcast remains of the prologue.
        if _BCAST_MODE == "split":
            (dvals,), _ = _bcast_epilogue([dmaps_ref[:]], oh, cd)
        else:
            dvals = _bcast_dot(_transpose_small_pl(dmaps_ref[:]), oh)
        sem_in = h_ref[0, :, :].astype(cd)
    else:
        if _BCAST_MODE == "split":
            (od9, dvals), _ = _bcast_epilogue([odv_ref[:], dmaps_ref[:]], oh, cd)
            od6 = od9[0:6]
        else:
            od6 = _bcast_dot(_transpose_small_pl(odv_ref[:])[0:6], oh)
            dvals = _bcast_dot(_transpose_small_pl(dmaps_ref[:]), oh)
        if stream_h:
            h = h_ref[0, :, :].astype(cd)
            if sem_with_coord:
                z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)
                pts = od6[0:3] + od6[3:6] * z_flat
                emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
        else:
            z_flat = _rows_to_lanes(z_ref, r_blk, s).astype(jnp.float32)
            pts = od6[0:3] + od6[3:6] * z_flat
            emb = _pe_in_kernel_pl(pts, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
            it = iter(range(n_w))
            h = _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd)
            k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
    s_act = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]),
                        0.0).astype(cd)

    # sem_map = sum_i w_i * sem_i with w a non-grad constant: the per-point
    # sem cotangent is just the broadcast sem-map cotangent scaled by w. The
    # rgb/depth/acc map columns and the weights cotangent have exactly-zero
    # dependence on the sem head — dropped, not approximated.
    w = _rows_to_lanes(win_ref, r_blk, s).astype(jnp.float32)  # [1, N]
    d_sem = dvals[5:] * w  # [sem_dim, N]

    d_sem_c = d_sem.astype(cd)
    dw_refs[1][:] += tm(s_act, d_sem_c)
    db_refs[1][:] += jnp.sum(d_sem, 1, keepdims=True)
    ds = jnp.where(s_act.astype(jnp.float32) > 0,
                   jax.lax.dot_general(w_refs[k_s1][:].astype(cd), d_sem_c,
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32),
                   0.0).astype(cd)
    dw_refs[0][:] += tm(sem_in, ds)
    db_refs[0][:] += jnp.sum(ds.astype(jnp.float32), 1, keepdims=True)


def _train_render_frozen_bwd_impl(ws, bs, odv, z_vals, weights, dmaps,
                                  depth, skips, multires, sem_with_coord,
                                  compute_dtype_name,
                                  interpret: Optional[bool] = None,
                                  h_blocks: Optional[jnp.ndarray] = None,
                                  semin: bool = False):
    """pallas_call wrapper for the frozen-backbone backward.

    Streams only what the sem-head sweep needs: ray geometry + z (for the
    trunk forward recompute), the forward's weights output (25 MB at the
    flagship fine shape — cheaper than recomputing alpha + composite), the
    map cotangents, and the TRUNK+SEM weight subset (alpha/feature/views/rgb
    and the dirs-PE constants never enter the kernel).
    """
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _train_ray_block(S, frozen=True)
    (odv, dmaps, weights), z_vals, R, pad = _pad_rays(
        [odv, dmaps, weights], z_vals, r_blk)
    if pad:
        # padded rays replicate edge rays: zero their cotangent contribution
        mask = (jnp.arange(z_vals.shape[0]) < R).astype(dmaps.dtype)
        dmaps = dmaps * mask[:, None]
    n_blocks = z_vals.shape[0] // r_blk
    stream_h = h_blocks is not None
    ws_u = ws[-2:] if stream_h else ws[:depth] + ws[-2:]
    bs_u = bs[-2:] if stream_h else bs[:depth] + bs[-2:]
    ws_c = tuple(w.astype(compute_dtype) for w in ws_u)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs_u)
    mt_pts, ph_pts = _pe_consts_pl(multires)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, _ = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    n_maps = dmaps.shape[-1]
    h_ops, h_specs = (), ()
    if stream_h:
        # block-major [n_blocks, W, r_blk*S] (same legality rule as the mip
        # streams: block == trailing array dims)
        h_ops = (h_blocks,)
        h_specs = (pl.BlockSpec((1, h_blocks.shape[1], r_blk * S),
                                lambda i: (i, 0, 0), memory_space=pltpu.VMEM),)
    sem_shapes = [ws_u[-2].shape, ws_u[-1].shape]
    sem_b = [bs_u[-2].shape[0], bs_u[-1].shape[0]]
    outs = pl.pallas_call(
        functools.partial(
            _train_frozen_bwd_kernel, depth=depth, skips=skips,
            sem_with_coord=sem_with_coord, compute_dtype=compute_dtype,
            r_blk=r_blk, s=S, stream_h=stream_h, semin=semin and stream_h),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, n_maps), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot), full(mt_pts), full(ph_pts),
            *h_specs,
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=([acc2d(sh) for sh in sem_shapes]
                   + [acc2d((nb, 1)) for nb in sem_b]),
        out_shape=([jax.ShapeDtypeStruct(sh, jnp.float32) for sh in sem_shapes]
                   + [jax.ShapeDtypeStruct((nb, 1), jnp.float32) for nb in sem_b]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odv, z_vals, dmaps, weights, onehot, mt_pts, ph_pts, *h_ops, *ws_c,
      *bs_col)

    n_w = len(ws)
    dws = [jnp.zeros_like(w) for w in ws]
    dbs = [jnp.zeros_like(b) for b in bs]
    dws[n_w - 2] = outs[0].astype(ws[n_w - 2].dtype)
    dws[n_w - 1] = outs[1].astype(ws[n_w - 1].dtype)
    dbs[n_w - 2] = outs[2][:, 0].astype(bs[n_w - 2].dtype)
    dbs[n_w - 1] = outs[3][:, 0].astype(bs[n_w - 1].dtype)
    return tuple(dws), tuple(dbs)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def _train_render(ws, bs, odv, z_vals, seed, depth, skips, multires,
                  multires_views, use_semantics, sem_with_coord,
                  compute_dtype_name, noise_std, frozen=False):
    return _train_render_fwd_impl(ws, bs, odv, z_vals, seed, depth, skips,
                                  multires, multires_views, use_semantics,
                                  sem_with_coord, compute_dtype_name, noise_std,
                                  frozen_blk=bool(frozen) and use_semantics)


def _train_render_fwd_impl(ws, bs, odv, z_vals, seed, depth, skips, multires,
                           multires_views, use_semantics, sem_with_coord,
                           compute_dtype_name, noise_std,
                           interpret: Optional[bool] = None,
                           save_h: bool = False, save_semin: bool = False,
                           frozen_blk: bool = False):
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _train_ray_block(S, frozen_blk)
    (odv,), z_vals, R, pad = _pad_rays([odv], z_vals, r_blk)
    n_blocks = z_vals.shape[0] // r_blk
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _pe_consts_pl(multires, multires_views)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_maps = 5 + (ws[-1].shape[-1] if use_semantics else 0)
    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    h_out_specs, h_out_shapes = [], []
    if save_h or save_semin:
        # trunk output width — _mlp_trunk re-concats emb when the LAST layer
        # index is a skip (e.g. tiny test nets with depth 5, skips=(4,))
        width = ws[depth - 1].shape[-1] + (
            (3 + 6 * multires) if (depth - 1) in skips else 0)
        if save_semin and sem_with_coord:
            width += 3 + 6 * multires  # sem_in = [h; emb]
        h_out_specs = [pl.BlockSpec((1, width, r_blk * S),
                                    lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)]
        h_out_shapes = [jax.ShapeDtypeStruct((n_blocks, width, r_blk * S),
                                             compute_dtype)]
    outs = pl.pallas_call(
        functools.partial(
            _train_render_kernel, depth=depth, skips=skips,
            use_semantics=use_semantics, sem_with_coord=sem_with_coord,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            noise_std=noise_std, save_h=save_h, save_semin=save_semin),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=[
            pl.BlockSpec((r_blk, n_maps), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *h_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r_blk, n_maps), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * r_blk, S), jnp.float32),
            *h_out_shapes,
        ],
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odv, z_vals, seed, onehot, seg, *pe_args, *ws_c, *bs_col)
    maps, weights = outs[0], outs[1]
    if pad:
        maps, weights = maps[:R], weights[:R]
    if save_h or save_semin:
        return maps, weights, outs[2]  # h stays padded/block-major (bwd form)
    return maps, weights


def _train_render_fwd(ws, bs, odv, z_vals, seed, *static):
    frozen = static[-1]
    depth, skips, multires = static[0], static[1], static[2]
    use_semantics, sem_with_coord = static[4], static[5]
    mode = None
    if bool(frozen) and use_semantics:
        width = ws[depth - 1].shape[-1] + (
            (3 + 6 * multires) if (depth - 1) in skips else 0)
        if _FROZEN_BWD_MODE == "stream_semin" and sem_with_coord:
            width += 3 + 6 * multires
        itemsize = 2 if static[6] == "bfloat16" else 4
        mode = _frozen_stream_mode(z_vals.shape[0] * z_vals.shape[-1],
                                   width, itemsize)
    save_h, save_semin = mode == "stream_h", mode == "stream_semin"
    outs = _train_render_fwd_impl(ws, bs, odv, z_vals, seed, *static[:-1],
                                  save_h=save_h, save_semin=save_semin,
                                  frozen_blk=bool(frozen) and use_semantics)
    maps, weights = outs[0], outs[1]
    # frozen mode: the backward takes the composite weights from the forward
    # instead of recomputing sigma + noise + composite (bit-identical values;
    # +25 MB of residual HBM at the flagship fine shape). stream_h /
    # stream_semin additionally save the trunk output h / the full sem-head
    # input (see _FROZEN_BWD_MODE).
    return (maps, weights), (ws, bs, odv, z_vals, seed,
                             weights if frozen else None,
                             outs[2] if (save_h or save_semin) else None)


def _train_render_bwd(depth, skips, multires, multires_views, use_semantics,
                      sem_with_coord, compute_dtype_name, noise_std, frozen,
                      residuals, cots, interpret: Optional[bool] = None):
    ws, bs, odv, z_vals, seed, res_weights, res_h = residuals
    dmaps, dweights = cots
    if frozen:
        # Reference --fix_backbone parity: only the semantic head is
        # trainable, and nothing but the sem-map columns depends on it. The
        # weights cotangent and the rgb/depth/acc columns are dropped with
        # exactly-zero error (see _train_frozen_bwd_kernel).
        if not use_semantics:
            return (tuple(jnp.zeros_like(w) for w in ws),
                    tuple(jnp.zeros_like(b) for b in bs),
                    jnp.zeros_like(odv), jnp.zeros_like(z_vals),
                    jnp.zeros_like(seed))
        dws, dbs = _train_render_frozen_bwd_impl(
            ws, bs, odv, z_vals, res_weights, dmaps,
            depth, skips, multires, sem_with_coord, compute_dtype_name,
            interpret=interpret, h_blocks=res_h,
            semin=_FROZEN_BWD_MODE == "stream_semin")
        return (dws, dbs, jnp.zeros_like(odv), jnp.zeros_like(z_vals),
                jnp.zeros_like(seed))
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _train_ray_block(S)
    odv0, z0 = odv, z_vals
    (odv, dmaps, dweights), z_vals, R, pad = _pad_rays(
        [odv, dmaps, dweights], z_vals, r_blk)
    if pad:
        # padded rays must contribute ZERO cotangent (they replicate edge rays)
        mask = (jnp.arange(z_vals.shape[0]) < R).astype(dmaps.dtype)
        dmaps = dmaps * mask[:, None]
        dweights = dweights * mask[:, None]
    n_blocks = z_vals.shape[0] // r_blk
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _pe_consts_pl(multires, multires_views)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    w_shapes = [w.shape for w in ws]
    b_sizes = [b.shape[0] for b in bs]
    n_maps = dmaps.shape[-1]
    outs = pl.pallas_call(
        functools.partial(
            _train_render_bwd_kernel, depth=depth, skips=skips,
            use_semantics=use_semantics, sem_with_coord=sem_with_coord,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            noise_std=noise_std),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((r_blk, n_maps), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=([acc2d(s) for s in w_shapes]
                   + [acc2d((nb, 1)) for nb in b_sizes]),
        out_shape=([jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes]
                   + [jax.ShapeDtypeStruct((nb, 1), jnp.float32) for nb in b_sizes]),
        # The recompute+reverse sweep at the minimum legal block (8 rays x
        # 192 samples) needs an 18 MB VMEM stack — over the default 16 MB
        # scoped limit but far under the chip's 128 MB VMEM. Raise the cap
        # (costs pipelining headroom the sequential-grid reduction pattern
        # doesn't use anyway).
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odv, z_vals, seed, dmaps, dweights, onehot, seg, *pe_args, *ws_c, *bs_col)

    n_w = len(ws)
    dws = tuple(outs[i].astype(ws[i].dtype) for i in range(n_w))
    dbs = tuple(outs[n_w + i][:, 0].astype(bs[i].dtype) for i in range(n_w))
    # rays-as-data / detached z: exact-zero cotangents (see section header)
    return (dws, dbs, jnp.zeros_like(odv0), jnp.zeros_like(z0),
            jnp.zeros_like(seed))


_train_render.defvjp(_train_render_fwd, _train_render_bwd)


def fused_train_render_planar(params: Dict[str, Any], odv: jnp.ndarray,
                              z_vals: jnp.ndarray, cfg,
                              depth: Optional[int] = None,
                              noise_std: float = 0.0,
                              noise_key: Optional[jax.Array] = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused render (train path).

    Args: odv [R, 9] (o, d, viewdirs columns), z_vals [R, S].
    Returns (maps [R, 5+sem], weights [R, S]) — see finish_maps.
    Gradients flow to params only (odv/z/key get exact zeros).

    ``cfg.frozen_backbone`` switches the backward to the semantic-head-only
    sweep (reference ``--fix_backbone``, ``run_nerf.py:307-318``): torch's
    ``requires_grad=False`` never builds the trunk backward, and neither do
    we — see _train_frozen_bwd_kernel.
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, cfg.use_semantics)
    if noise_std > 0.0 and noise_key is not None:
        seed = jax.random.randint(noise_key, (1, 1), 0, 2 ** 31 - 1).astype(jnp.float32)
    else:
        seed = jnp.zeros((1, 1), jnp.float32)
    frozen = bool(getattr(cfg, "frozen_backbone", False)) and cfg.use_semantics
    return _train_render(
        tuple(ws), tuple(bs), odv, z_vals, seed,
        depth, (4,), cfg.multires, cfg.multires_views,
        cfg.use_semantics, cfg.sem_with_coord, cfg.compute_dtype,
        float(noise_std), frozen,
    )


def fused_rgb_train_grads(params: Dict[str, Any], odv: jnp.ndarray,
                          z_vals: jnp.ndarray, gt: jnp.ndarray, cfg,
                          depth: Optional[int] = None,
                          noise_std: float = 0.0,
                          noise_key: Optional[jax.Array] = None,
                          interpret: Optional[bool] = None):
    """ONE kernel per pass for the RGB trainer: forward recompute + maps +
    in-kernel img2mse cotangent + full reverse sweep — 3x the forward matmul
    FLOPs instead of the 4x of fwd-kernel + recompute-bwd (the separate
    forward pass disappears entirely).

    Args: odv [R, 9], z_vals [R, S], gt [R, 3].
    Returns (grads_mlp: dict mirroring params['mlp'] with UNSCALED dW/db —
    caller multiplies by rgb_w/(R*3); maps [R, 5+sem]; weights [R, S]).
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, cfg.use_semantics)
    names = [f"pts_linears_{i}" for i in range(depth)]
    names += ["alpha_linear", "feature_linear", "views_linears_0", "rgb_linear"]
    if cfg.use_semantics:
        names += ["sem_0", "sem_1"]
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    S = z_vals.shape[-1]
    r_blk = _train_ray_block(S)
    R = z_vals.shape[0]
    if noise_std > 0.0 and noise_key is not None:
        seed = jax.random.randint(noise_key, (1, 1), 0, 2 ** 31 - 1).astype(jnp.float32)
    else:
        seed = jnp.zeros((1, 1), jnp.float32)
    valid = jnp.ones((R, 1), jnp.float32)
    (odv, gt, valid), z_vals, R, pad = _pad_rays([odv, gt, valid], z_vals, r_blk)
    if pad:
        valid = valid * (jnp.arange(z_vals.shape[0]) < R).astype(
            jnp.float32)[:, None]
    n_blocks = z_vals.shape[0] // r_blk
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _pe_consts_pl(cfg.multires, cfg.multires_views)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_maps = 5 + (ws[-1].shape[-1] if cfg.use_semantics else 0)
    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    w_shapes = [w.shape for w in ws]
    b_sizes = [b.shape[0] for b in bs]
    outs = pl.pallas_call(
        functools.partial(
            _train_render_bwd_kernel, depth=depth, skips=(4,),
            use_semantics=cfg.use_semantics, sem_with_coord=cfg.sem_with_coord,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            noise_std=float(noise_std), rgb_loss=True,
            white_bkgd=cfg.white_bkgd),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 9), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((r_blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=([acc2d(sh) for sh in w_shapes]
                   + [acc2d((nb, 1)) for nb in b_sizes]
                   + [pl.BlockSpec((r_blk, n_maps), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((r_blk, S), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]),
        out_shape=([jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes]
                   + [jax.ShapeDtypeStruct((nb, 1), jnp.float32) for nb in b_sizes]
                   + [jax.ShapeDtypeStruct((z_vals.shape[0], n_maps), jnp.float32),
                      jax.ShapeDtypeStruct((z_vals.shape[0], S), jnp.float32)]),
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odv, z_vals, seed, gt, valid, onehot, seg, *pe_args, *ws_c, *bs_col)

    n_w = len(ws)
    grads = {nm: {"kernel": outs[i].astype(ws[i].dtype),
                  "bias": outs[n_w + i][:, 0].astype(bs[i].dtype)}
             for i, nm in enumerate(names)}
    maps, weights = outs[2 * n_w], outs[2 * n_w + 1]
    if pad:
        maps, weights = maps[:R], weights[:R]
    return {"mlp": grads}, maps, weights


# ---------------------------------------------------------------------------
# mip-NeRF fused render (eval): cast_rays (stable conical frustums) + IPE +
# MLP + mip compositing in one kernel per pass. Parity: reference
# models/mip_nerf_net.py:44-233 (cast_rays) + models/renderer.py:98-152
# (MipVolumetricRenderer: midpoint depths, NO far-padding of dists).
# Forward-only — mip training keeps the custom-vjp planar IPE field kernel.
# ---------------------------------------------------------------------------


def _mip_gauss_lane(z_ref, o3, d3, radii, r_blk: int, ray_shape: str):
    """Fencepost rows -> lane-axis (t0, t1, Gaussian mean, diag cov).

    The conical-frustum -> diagonal-Gaussian stable closed forms of the
    reference (models/mip_nerf_net.py:95-105), computed per point on the
    lane axis. o3/d3/radii are the EXACT per-point broadcasts."""
    t0 = jnp.concatenate([z_ref[r:r + 1, :-1] for r in range(r_blk)], axis=1
                         ).astype(jnp.float32)
    t1 = jnp.concatenate([z_ref[r:r + 1, 1:] for r in range(r_blk)], axis=1
                         ).astype(jnp.float32)
    if ray_shape == "cone":
        mu = (t0 + t1) * 0.5
        hw = (t1 - t0) * 0.5
        denom = 3.0 * mu * mu + hw * hw
        t_mean = mu + (2.0 * mu * hw * hw) / denom
        t_var = (hw * hw) / 3.0 - (4.0 / 15.0) * (
            (hw ** 4) * (12.0 * mu * mu - hw * hw) / (denom * denom))
        r_var = (radii * radii) * ((mu * mu) / 4.0 + (5.0 / 12.0) * hw * hw
                                   - (4.0 / 15.0) * (hw ** 4) / denom)
    else:  # cylinder
        t_mean = (t0 + t1) * 0.5
        r_var = (radii * radii) / 4.0
        t_var = (t1 - t0) ** 2 / 12.0

    mean = o3 + d3 * t_mean  # [3, N]
    d_mag_sq = jnp.maximum(1e-10, d3[0:1] ** 2 + d3[1:2] ** 2 + d3[2:3] ** 2)
    d_outer = d3 * d3
    cov = t_var * d_outer + r_var * (1.0 - d_outer / d_mag_sq)  # [3, N]
    return t0, t1, mean, cov


def _mip_composite_lane(sigma, t0, t1, d3, sid, s: int):
    """Mip quadrature weights on the lane axis (math of
    core/render.mip_volumetric_render, reference models/renderer.py:98-152):
    dists from fenceposts, NO far padding; returns the terms the backward
    reuses (mirror of _composite_lane)."""
    norm_d = jnp.sqrt(d3[0:1] ** 2 + d3[1:2] ** 2 + d3[2:3] ** 2)
    D = (t1 - t0) * norm_d
    return _mip_composite_from_D(sigma, D, sid, s)


def _mip_composite_from_D(sigma, D, sid, s: int):
    """Mip composite from precomputed per-point dists D (the streamed-Gaussian
    path: D arrives from XLA instead of t0/t1/d3 lanes); the tail of
    _mip_composite_lane, op-for-op."""
    e = jnp.exp(-jnp.maximum(sigma, 0.0) * D)
    alpha = 1.0 - e
    y = e + 1e-10
    T = _seg_cumprod_excl(y, sid, s)
    return alpha, y, T, alpha * T, e, D


def _mip_gauss_planar_xla(odvr: jnp.ndarray, z: jnp.ndarray,
                          ray_shape: str) -> jnp.ndarray:
    """XLA twin of _mip_gauss_lane (+ the composite's mids/D): [R, 10] rows,
    [R, S+1] fenceposts -> [8, R*S] f32 planar (mean3, cov3, mids, D),
    ray-major on lanes — one perfectly-tiled (8 sublanes) streamed operand.

    Same closed forms, same op order, f32 throughout (reference
    models/mip_nerf_net.py:95-105); kernel-vs-stream parity is asserted by
    tests/test_mip.py and the on-chip A/B (tools/perf_mip_stream.py)."""
    o = odvr[:, 0:3].astype(jnp.float32)
    d = odvr[:, 3:6].astype(jnp.float32)
    radii = odvr[:, 9:10].astype(jnp.float32)
    z = z.astype(jnp.float32)
    t0, t1 = z[:, :-1], z[:, 1:]
    if ray_shape == "cone":
        mu = (t0 + t1) * 0.5
        hw = (t1 - t0) * 0.5
        denom = 3.0 * mu * mu + hw * hw
        t_mean = mu + (2.0 * mu * hw * hw) / denom
        t_var = (hw * hw) / 3.0 - (4.0 / 15.0) * (
            (hw ** 4) * (12.0 * mu * mu - hw * hw) / (denom * denom))
        r_var = (radii * radii) * ((mu * mu) / 4.0 + (5.0 / 12.0) * hw * hw
                                   - (4.0 / 15.0) * (hw ** 4) / denom)
    else:  # cylinder
        t_mean = (t0 + t1) * 0.5
        r_var = (radii * radii) / 4.0
        t_var = (t1 - t0) ** 2 / 12.0

    mean = o[:, None, :] + d[:, None, :] * t_mean[..., None]      # [R, S, 3]
    d_mag_sq = jnp.maximum(1e-10, d[:, 0:1] ** 2 + d[:, 1:2] ** 2
                           + d[:, 2:3] ** 2)                       # [R, 1]
    d_outer = d * d                                                # [R, 3]
    cov = (t_var[..., None] * d_outer[:, None, :]
           + r_var[..., None] * (1.0 - d_outer / d_mag_sq)[:, None, :])
    mids = (t0 + t1) * 0.5
    norm_d = jnp.sqrt(d[:, 0:1] ** 2 + d[:, 1:2] ** 2 + d[:, 2:3] ** 2)
    dists = (t1 - t0) * norm_d
    r, s = t0.shape
    return jnp.concatenate([
        mean.transpose(2, 0, 1).reshape(3, r * s),
        cov.transpose(2, 0, 1).reshape(3, r * s),
        mids.reshape(1, r * s),
        dists.reshape(1, r * s),
    ], axis=0)


def _mip_render_kernel(
    odvr_ref, z_ref, *rest,
    depth: int, skips: Tuple[int, ...], compute_dtype, r_blk: int, s: int,
    ray_shape: str, stream: str = "none",
):
    """One ray block: odvr [R_blk, 10] (o, d, viewdirs, radii columns),
    z [R_blk, S+1] fenceposts -> maps [R_blk, 5] (w·sigmoid(rgb) x3, w·mids,
    acc) + weights [R_blk, S].

    ``stream`` (the VERDICT r4 #4 counter-hypothesis arms — HBM traffic for
    VPU prologue time): "gauss" — the Gaussian/composite geometry (mean3,
    cov3, mids, D) arrives precomputed from XLA (_mip_gauss_planar_xla);
    "ipe" — the WHOLE integrated-PE embedding arrives at compute_dtype plus
    (mids, D) f32, removing every in-kernel transcendental."""
    from nerfsos_tpu.ops.pallas.fused_field import _ipe_in_kernel_pl

    if stream != "none":
        (gauss_ref, oh_ref, seg_ref, mt_pts_ref, ph_pts_ref,
         mt_dirs_ref, ph_dirs_ref, *refs) = rest
    else:
        (oh_ref, seg_ref, mt_pts_ref, ph_pts_ref,
         mt_dirs_ref, ph_dirs_ref, *refs) = rest
    if stream == "ipe":
        md_ref = refs[0]
        refs = refs[1:]
    n_w = depth + 4
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    maps_ref, wout_ref = refs[2 * n_w], refs[2 * n_w + 1]
    cd = compute_dtype
    n = r_blk * s

    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    odvr_t = None
    if stream != "none":
        t0 = t1 = d3 = None
        if stream == "gauss":
            g = gauss_ref[0]  # [8, N] from the (1, 8, N) block
            mean, cov = g[0:3], g[3:6]
            mids, dists = g[6:7], g[7:8]
        else:  # "ipe": embedding already built; only mids/D geometry needed
            md = md_ref[0]
            mids, dists = md[0:1], md[1:2]
        if _BCAST_MODE == "split":
            # only the viewdirs PE needs broadcasting now
            _, demb = _bcast_epilogue([odvr_ref[:, 6:9]], oh, cd,
                                      dirs_cols=(0, 3),
                                      mt_dirs_ref=mt_dirs_ref,
                                      ph_dirs_ref=ph_dirs_ref)
        else:
            odvr_t = _transpose_small_pl(odvr_ref[:])
    elif _BCAST_MODE == "split":
        (od10,), demb = _bcast_epilogue([odvr_ref[:]], oh, cd,
                                        dirs_cols=(6, 9),
                                        mt_dirs_ref=mt_dirs_ref,
                                        ph_dirs_ref=ph_dirs_ref)
        o3, d3, radii = od10[0:3], od10[3:6], od10[9:10]
    else:
        odvr_t = _transpose_small_pl(odvr_ref[:])    # [10, r_blk], exact
        odr = _bcast_dot(jnp.concatenate([odvr_t[0:6], odvr_t[9:10]], axis=0),
                         oh)
        o3, d3, radii = odr[0:3], odr[3:6], odr[6:7]  # [*, N], exact
    if stream == "none":
        t0, t1, mean, cov = _mip_gauss_lane(z_ref, o3, d3, radii, r_blk,
                                            ray_shape)
        mids = (t0 + t1) * 0.5
    if stream == "ipe":
        emb = gauss_ref[0].astype(cd)  # [2FD, N] streamed at compute dtype
    else:
        emb = _ipe_in_kernel_pl(mean, cov, mt_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    h = _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])  # [1, N] fp32
    if _BCAST_MODE != "split":
        # per-ray viewdirs PE, broadcast after (exact — see _render_kernel)
        demb_r = _pe_in_kernel_pl(odvr_t[6:9], mt_dirs_ref[:], ph_dirs_ref[:])
        demb = _bcast_dot(demb_r, oh).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv = jnp.maximum(_mm_pl(jnp.concatenate([feat, demb], axis=0),
                            w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    # mip composite: dists from fenceposts, NO far padding; depth uses mids
    if _COMPOSITE_MODE == "rows":
        scr_ref = refs[2 * n_w + 2]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        _, _, _, w_rows, _, _, _ = _mip_composite_rows(
            sig_rows, z_ref[:, :-1].astype(jnp.float32),
            z_ref[:, 1:].astype(jnp.float32), odvr_ref[:, 3:6], r_blk, s)
        wout_ref[:] = w_rows
        w = _rows_to_lanes(wout_ref, r_blk, s)
    elif stream != "none":
        _, _, _, w, _, _ = _mip_composite_from_D(sigma, dists, sid, s)
    else:
        _, _, _, w, _, _ = _mip_composite_lane(sigma, t0, t1, d3, sid, s)
    rgb = jax.nn.sigmoid(rgb_logits)
    vals = jnp.concatenate([w * rgb, w * mids, w], axis=0)  # [5, N]

    maps_ref[:] = jax.lax.dot_general(seg_ref[:], vals, (((0,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    if _COMPOSITE_MODE != "rows":
        _store_rows(wout_ref, w, r_blk, s)


def fused_mip_render_planar(params: Dict[str, Any], odvr: jnp.ndarray,
                            z_vals: jnp.ndarray, cfg, ray_shape: str = "cone",
                            depth: Optional[int] = None,
                            interpret: Optional[bool] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused mip pass: odvr [R, 10] (o, d, viewdirs, radii), z [R, S+1]
    fenceposts -> (maps [R, 5], weights [R, S]). Eval-only (no VJP, no
    noise)."""
    from nerfsos_tpu.ops.pallas.fused_field import _ipe_consts_pl

    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, False)
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    S = z_vals.shape[-1] - 1
    # The mip kernel builds frustum Gaussians + the IPE in-kernel (much more
    # VPU work and VMEM per point than the classic kernel) and prefers SMALL
    # blocks: target 1536 pts measured 343.8k vs 337.2k (2048) vs 274.7k
    # (the classic kernels' 4608) rays/s (tools/perf_mip_block.py, one v5e).
    stream = {"kernel": "none", "stream": "gauss", "ipe": "ipe"}[_MIP_GAUSS_MODE]
    r_blk = (RAY_BLOCK if RAY_BLOCK is not None
             else max(8, (_MIP_TARGET_N // (8 * S)) * 8))
    (odvr,), z_vals, R, pad = _pad_rays([odvr], z_vals, r_blk)
    n_blocks = z_vals.shape[0] // r_blk

    ws = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _ipe_consts_pl(cfg.multires, cfg.multires_views)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    gauss_ops, gauss_specs = (), ()
    md_ops, md_specs = (), ()
    if stream != "none":
        # Block-major 3D layout [n_blocks, C, r_blk*S]: a 2D [C, N] operand
        # with block (C, r_blk*S) violates the Pallas tiling rule when
        # r_blk*S % 128 != 0 (block dims must be 8/128-divisible OR equal to
        # the array dims — on-chip lowering error, round 5); with the block
        # dims EQUAL to the trailing array dims any r_blk*S is legal.
        blocked = lambda x: x.reshape(x.shape[0], n_blocks, r_blk * S
                                      ).transpose(1, 0, 2)
        spec3 = lambda c, _i=None: pl.BlockSpec(
            (1, c, r_blk * S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        g = _mip_gauss_planar_xla(odvr, z_vals, ray_shape)
        if stream == "gauss":
            gauss_ops, gauss_specs = (blocked(g),), (spec3(8),)
        else:  # "ipe": full embedding at compute dtype + (mids, D) f32
            from nerfsos_tpu.ops.pallas.fused_field import _ipe_in_kernel_pl
            emb = _ipe_in_kernel_pl(g[0:3], g[3:6],
                                    pe_args[0]).astype(compute_dtype)
            gauss_ops, gauss_specs = (blocked(emb),), (spec3(emb.shape[0]),)
            md_ops, md_specs = (blocked(g[6:8]),), (spec3(2),)
    maps, weights = pl.pallas_call(
        functools.partial(
            _mip_render_kernel, depth=depth, skips=(4,),
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            ray_shape=ray_shape, stream=stream),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 10), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *gauss_specs,
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *md_specs,
            *[full(w) for w in ws],
            *[full(b) for b in bs_col],
        ],
        out_specs=[
            pl.BlockSpec((r_blk, 5), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r_blk, 5), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * r_blk, S), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odvr, z_vals, *gauss_ops, onehot, seg, *pe_args, *md_ops, *ws, *bs_col)
    if pad:
        maps, weights = maps[:R], weights[:R]
    return maps, weights


def _mip_train_kernel(
    odvr_ref, z_ref, seed_ref, oh_ref, seg_ref,
    mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], compute_dtype, r_blk: int, s: int,
    ray_shape: str, noise_std: float,
):
    """Forward of the fused mip TRAIN render: _mip_render_kernel + pre-relu
    noise (the in-kernel SplitMix+Box-Muller stream of _noise_lanes)."""
    from nerfsos_tpu.ops.pallas.fused_field import _ipe_in_kernel_pl

    n_w = depth + 4
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    maps_ref, wout_ref = refs[2 * n_w], refs[2 * n_w + 1]
    cd = compute_dtype
    n = r_blk * s

    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    (od10,), demb = _bcast_epilogue([odvr_ref[:]], oh, cd, dirs_cols=(6, 9),
                                    mt_dirs_ref=mt_dirs_ref,
                                    ph_dirs_ref=ph_dirs_ref)
    o3, d3, radii = od10[0:3], od10[3:6], od10[9:10]
    t0, t1, mean, cov = _mip_gauss_lane(z_ref, o3, d3, radii, r_blk, ray_shape)
    emb = _ipe_in_kernel_pl(mean, cov, mt_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    h = _mlp_trunk(emb, w_refs, b_refs, it, depth, skips, cd)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])
    if noise_std > 0.0:
        sigma = sigma + _noise_lanes(seed_ref[0, 0], pl.program_id(0), n,
                                     noise_std)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv = jnp.maximum(_mm_pl(jnp.concatenate([feat, demb], axis=0),
                            w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    if _COMPOSITE_MODE == "rows":
        scr_ref = refs[2 * n_w + 2]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        _, _, _, w_rows, _, _, _ = _mip_composite_rows(
            sig_rows, z_ref[:, :-1].astype(jnp.float32),
            z_ref[:, 1:].astype(jnp.float32), odvr_ref[:, 3:6], r_blk, s)
        wout_ref[:] = w_rows
        w = _rows_to_lanes(wout_ref, r_blk, s)
    else:
        _, _, _, w, _, _ = _mip_composite_lane(sigma, t0, t1, d3, sid, s)
    rgb = jax.nn.sigmoid(rgb_logits)
    mids = (t0 + t1) * 0.5
    vals = jnp.concatenate([w * rgb, w * mids, w], axis=0)
    maps_ref[:] = jax.lax.dot_general(seg_ref[:], vals, (((0,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    if _COMPOSITE_MODE != "rows":
        _store_rows(wout_ref, w, r_blk, s)


def _mip_train_bwd_kernel(
    odvr_ref, z_ref, seed_ref, dmaps_ref, dwin_ref, oh_ref, seg_ref,
    mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], compute_dtype, r_blk: int, s: int,
    ray_shape: str, noise_std: float,
):
    """Backward of the fused mip train render: recompute the forward
    (cast + IPE + MLP + composite), form the raw cotangents from the
    map/weight cotangents in kernel, then the planar MLP reverse sweep
    (the dW/db grid-accumulation pattern of _train_render_bwd_kernel).
    Gradients flow to the MLP params only — odvr and the fencepost z are
    data/detached on every shipped mip trainer (importance z is
    stop-gradient, core/sampling.py:186)."""
    from nerfsos_tpu.ops.pallas.fused_field import _ipe_in_kernel_pl

    n_w = depth + 4
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    dw_refs = refs[2 * n_w:3 * n_w]
    db_refs = refs[3 * n_w:4 * n_w]
    cd = compute_dtype
    n = r_blk * s

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    def tm(a, b):
        return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def wd(w_, d_):
        return jax.lax.dot_general(w_.astype(cd), d_.astype(cd),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def relu_bwd(act, d_):
        return jnp.where(act.astype(jnp.float32) > 0, d_, 0.0)

    # ---- forward recompute (cast + IPE + MLP) -----------------------------
    _, sid = _seg_ids(n, s)
    oh = oh_ref[:]
    outs, demb = _bcast_epilogue([odvr_ref[:], dmaps_ref[:]], oh, cd,
                                 dirs_cols=(6, 9), mt_dirs_ref=mt_dirs_ref,
                                 ph_dirs_ref=ph_dirs_ref)
    od10, dvals = outs
    o3, d3, radii = od10[0:3], od10[3:6], od10[9:10]
    t0, t1, mean, cov = _mip_gauss_lane(z_ref, o3, d3, radii, r_blk, ray_shape)
    emb = _ipe_in_kernel_pl(mean, cov, mt_pts_ref[:]).astype(cd)
    it = iter(range(n_w))
    acts, ins = [], [emb]
    h = emb
    for i in range(depth):
        k = next(it)
        a = jnp.maximum(_mm_pl(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        acts.append(a)
        h = jnp.concatenate([emb, a], axis=0) if i in skips else a
        if i + 1 < depth:
            ins.append(h)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    sigma = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])
    if noise_std > 0.0:
        sigma = sigma + _noise_lanes(seed_ref[0, 0], pl.program_id(0), n,
                                     noise_std)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv_in = jnp.concatenate([feat, demb], axis=0)
    hv = jnp.maximum(_mm_pl(hv_in, w_refs[k_views][:], b_refs[k_views][:]),
                     0.0).astype(cd)
    rgb_logits = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    if _COMPOSITE_MODE == "rows":
        # ONE scratch reused sequentially (see _train_render_bwd_kernel)
        scr_ref = refs[-1]
        sig_rows = _lanes_to_rows_vmem(sigma, scr_ref, r_blk, s)
        alpha_r, y_r, T_r, w_rows, e_r, D_r, sig_r = _mip_composite_rows(
            sig_rows, z_ref[:, :-1].astype(jnp.float32),
            z_ref[:, 1:].astype(jnp.float32), odvr_ref[:, 3:6], r_blk, s)
        w = _rows_to_lanes_vmem(w_rows, scr_ref, r_blk, s)
    else:
        alpha, y, T, w, e, D = _mip_composite_lane(sigma, t0, t1, d3, sid, s)
    rgb = jax.nn.sigmoid(rgb_logits)
    mids = (t0 + t1) * 0.5

    # ---- composite cotangents (maps rows: w*rgb x3, w*mids, w) ------------
    dw = (dvals[0:1] * rgb[0:1] + dvals[1:2] * rgb[1:2] + dvals[2:3] * rgb[2:3]
          + dvals[3:4] * mids + dvals[4:5])
    d_rgb = (dvals[0:3] * w) * (rgb * (1.0 - rgb))
    if _COMPOSITE_MODE == "rows":
        dw_r = (_lanes_to_rows_vmem(dw, scr_ref, r_blk, s)
                + dwin_ref[:].astype(jnp.float32))
        dalpha_r = dw_r * T_r
        dT_r = dw_r * alpha_r
        dy_r = _rev_cumsum_excl_rows(dT_r * T_r, s) / y_r
        dalpha_r = dalpha_r - dy_r
        d_sigma = _rows_to_lanes_vmem(
            jnp.where(sig_r > 0.0, dalpha_r * e_r * D_r, 0.0),
            scr_ref, r_blk, s)
    else:
        dw = dw + _rows_to_lanes(dwin_ref, r_blk, s).astype(jnp.float32)
        dalpha = dw * T
        dT = dw * alpha
        dy = _seg_rev_cumsum_excl(dT * T, sid, s) / y
        dalpha = dalpha - dy
        d_sigma = jnp.where(sigma > 0.0, dalpha * e * D, 0.0)

    # ---- MLP reverse sweep (planar; no semantic branch) -------------------
    d_rgb_c = d_rgb.astype(cd)
    dw_refs[k_rgb][:] += tm(hv, d_rgb_c)
    db_refs[k_rgb][:] += jnp.sum(d_rgb, 1, keepdims=True)
    dhv = relu_bwd(hv, wd(w_refs[k_rgb][:], d_rgb_c)).astype(cd)

    dw_refs[k_views][:] += tm(hv_in, dhv)
    db_refs[k_views][:] += jnp.sum(dhv.astype(jnp.float32), 1, keepdims=True)
    dhv_in = wd(w_refs[k_views][:], dhv)
    d_feat = dhv_in[:feat.shape[0], :].astype(cd)

    dw_refs[k_feat][:] += tm(h, d_feat)
    db_refs[k_feat][:] += jnp.sum(d_feat.astype(jnp.float32), 1, keepdims=True)
    dh = wd(w_refs[k_feat][:], d_feat)

    # single-output-lane dot pothole: pad the alpha cotangent to 2 rows
    d_alpha_c = d_sigma.astype(cd)
    d_alpha2 = jnp.concatenate([d_alpha_c, jnp.zeros_like(d_alpha_c)], axis=0)
    dw_refs[k_alpha][:] += tm(h, d_alpha2)[:, 0:1]
    db_refs[k_alpha][:] += jnp.sum(d_sigma, 1, keepdims=True)
    dh += wd(w_refs[k_alpha][:], d_alpha_c)

    dcur = dh
    for i in reversed(range(depth)):
        if i in skips:
            dcur = dcur[emb.shape[0]:, :]
        dpre = relu_bwd(acts[i], dcur).astype(cd)
        dw_refs[i][:] += tm(ins[i], dpre)
        db_refs[i][:] += jnp.sum(dpre.astype(jnp.float32), 1, keepdims=True)
        dcur = wd(w_refs[i][:], dpre)


def _mip_blocks_and_consts(ws, bs, z_vals, multires, multires_views,
                           compute_dtype):
    from nerfsos_tpu.ops.pallas.fused_field import _ipe_consts_pl

    S = z_vals.shape[-1] - 1
    r_blk = (RAY_BLOCK if RAY_BLOCK is not None
             else max(8, (_MIP_TARGET_N // (8 * S)) * 8))
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    pe_args = _ipe_consts_pl(multires, multires_views)
    return S, r_blk, ws_c, bs_col, pe_args


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _mip_train_render(ws, bs, odvr, z_vals, seed, depth, skips, multires,
                      multires_views, compute_dtype_name, ray_shape,
                      noise_std):
    return _mip_train_fwd_impl(ws, bs, odvr, z_vals, seed, depth, skips,
                               multires, multires_views, compute_dtype_name,
                               ray_shape, noise_std)


def _mip_train_fwd_impl(ws, bs, odvr, z_vals, seed, depth, skips, multires,
                        multires_views, compute_dtype_name, ray_shape,
                        noise_std, interpret: Optional[bool] = None):
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    S, r_blk, ws_c, bs_col, pe_args = _mip_blocks_and_consts(
        ws, bs, z_vals, multires, multires_views, compute_dtype)
    (odvr,), z_vals, R, pad = _pad_rays([odvr], z_vals, r_blk)
    n_blocks = z_vals.shape[0] // r_blk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    maps, weights = pl.pallas_call(
        functools.partial(
            _mip_train_kernel, depth=depth, skips=skips,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            ray_shape=ray_shape, noise_std=noise_std),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 10), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=[
            pl.BlockSpec((r_blk, 5), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r_blk, 5), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * r_blk, S), jnp.float32),
        ],
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odvr, z_vals, seed, onehot, seg, *pe_args, *ws_c, *bs_col)
    if pad:
        maps, weights = maps[:R], weights[:R]
    return maps, weights


def _mip_train_fwd(ws, bs, odvr, z_vals, seed, *static):
    out = _mip_train_fwd_impl(ws, bs, odvr, z_vals, seed, *static)
    return out, (ws, bs, odvr, z_vals, seed)


def _mip_train_bwd(depth, skips, multires, multires_views, compute_dtype_name,
                   ray_shape, noise_std, residuals, cots,
                   interpret: Optional[bool] = None):
    ws, bs, odvr, z_vals, seed = residuals
    dmaps, dweights = cots
    compute_dtype = (jnp.bfloat16 if compute_dtype_name == "bfloat16"
                     else jnp.float32)
    S, r_blk, ws_c, bs_col, pe_args = _mip_blocks_and_consts(
        ws, bs, z_vals, multires, multires_views, compute_dtype)
    odvr0, z0 = odvr, z_vals
    (odvr, dmaps, dweights), z_vals, R, pad = _pad_rays(
        [odvr, dmaps, dweights], z_vals, r_blk)
    if pad:
        mask = (jnp.arange(z_vals.shape[0]) < R).astype(dmaps.dtype)
        dmaps = dmaps * mask[:, None]
        dweights = dweights * mask[:, None]
    n_blocks = z_vals.shape[0] // r_blk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    onehot, seg = _bcast_masks(r_blk, S)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    w_shapes = [w.shape for w in ws]
    b_sizes = [b.shape[0] for b in bs]
    outs = pl.pallas_call(
        functools.partial(
            _mip_train_bwd_kernel, depth=depth, skips=skips,
            compute_dtype=compute_dtype, r_blk=r_blk, s=S,
            ray_shape=ray_shape, noise_std=noise_std),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_blk, 10), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S + 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((r_blk, 5), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(onehot), full(seg),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=([acc2d(sh) for sh in w_shapes]
                   + [acc2d((nb, 1)) for nb in b_sizes]),
        out_shape=([jax.ShapeDtypeStruct(sh, jnp.float32) for sh in w_shapes]
                   + [jax.ShapeDtypeStruct((nb, 1), jnp.float32)
                      for nb in b_sizes]),
        scratch_shapes=([pltpu.VMEM((r_blk, S), jnp.float32)]
                        if _COMPOSITE_MODE == "rows" else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(odvr, z_vals, seed, dmaps, dweights, onehot, seg, *pe_args, *ws_c,
      *bs_col)

    n_w = len(ws)
    dws = tuple(outs[i].astype(ws[i].dtype) for i in range(n_w))
    dbs = tuple(outs[n_w + i][:, 0].astype(bs[i].dtype) for i in range(n_w))
    return (dws, dbs, jnp.zeros_like(odvr0), jnp.zeros_like(z0),
            jnp.zeros_like(seed))


_mip_train_render.defvjp(_mip_train_fwd, _mip_train_bwd)


def fused_mip_train_render_planar(params: Dict[str, Any], odvr: jnp.ndarray,
                                  z_vals: jnp.ndarray, cfg,
                                  ray_shape: str = "cone",
                                  depth: Optional[int] = None,
                                  noise_std: float = 0.0,
                                  noise_key: Optional[jax.Array] = None
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable fused mip render (train path): cast_rays + IPE + MLP +
    mip compositing in ONE kernel per pass, with a fused backward (forward
    recompute + in-kernel composite cotangents + planar reverse sweep).

    Args: odvr [R, 10] (o, d, viewdirs, radii columns), z_vals [R, S+1]
    fenceposts. Returns (maps [R, 5], weights [R, S]) — see finish_mip_maps.
    Gradients flow to params only (odvr/z/key get exact zeros — rays are
    data, importance z is detached). Reference semantics:
    models/mip_nerf_net.py:150-233 + models/renderer.py:98-152.
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, False)
    if noise_std > 0.0 and noise_key is not None:
        seed = jax.random.randint(noise_key, (1, 1), 0,
                                  2 ** 31 - 1).astype(jnp.float32)
    else:
        seed = jnp.zeros((1, 1), jnp.float32)
    return _mip_train_render(
        tuple(ws), tuple(bs), odvr, z_vals, seed, depth, (4,), cfg.multires,
        cfg.multires_views, cfg.compute_dtype, ray_shape, float(noise_std))


def finish_mip_maps(maps: jnp.ndarray, weights: jnp.ndarray,
                    white_bkgd: bool) -> Dict[str, jnp.ndarray]:
    """Mip per-ray finishing (reference renderer.py:139-152)."""
    rgb_map = maps[:, 0:3]
    depth_map = maps[:, 3:4]
    acc_map = maps[:, 4:5]
    depth_map = jnp.where(acc_map <= 1e-10, 1e10, depth_map)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    out = dict(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights,
               depth=depth_map)
    if white_bkgd:
        out["rgb"] = rgb_map + (1.0 - acc_map)
    return out
