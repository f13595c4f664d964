"""Pallas TPU kernel: fused positional-encoding + NeRF MLP field query.

The hottest op in the system (SURVEY.md §3.1): millions of points per step
through an 8x256 MLP. A plain XLA lowering writes every layer activation
(points x 256 floats) to HBM between matmuls; this kernel keeps the WHOLE
field query — PE (sin/cos feature build), the skip-connected trunk, and the
alpha/rgb/semantic heads — in VMEM per point-block, so HBM traffic is just
points in (3+3 floats) and raw channels out (4+sem floats). Weights
(~3 MB fp32) are VMEM-resident across the grid.

Supported configuration (the flagship path): use_viewdirs=True, 2-layer
semantic head, optional coord-concat, no conv_embed / geo gate — callers fall
back to the XLA field otherwise (``models/fields.py``).

Differentiability: ``fused_field_apply`` carries a ``jax.custom_vjp`` whose
backward rematerializes the pure-XLA field and uses ITS vjp — training
through the fused forward stays exact.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Block-size knobs (overridable for perf sweeps; None = built-in default).
# Read at TRACE time — set before the first jit of a given shape.
FWD_BLOCK: Optional[int] = None
BWD_BLOCK: Optional[int] = None


def _pe_phase(x: jnp.ndarray, M: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """x @ M + phase via exact fp32 multiply-adds on the VPU.

    NOT a dot: the MXU rounds inputs to bf16, and with frequencies up to
    2^max_freq the phase error is ~|x| * 2^max_freq * 2^-8 RADIANS — sin of
    that is a deformed encoding (this exact bug shipped in round 1 and made
    every on-chip fused render diverge from the reference while all CPU
    interpret-mode parity tests passed). K=3, so elementwise is also fast.
    """
    return (phase[None, :] + x[:, 0:1] * M[0:1, :]
            + x[:, 1:2] * M[1:2, :] + x[:, 2:3] * M[2:3, :])


def _pe_phase_t(d: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """d @ M^T via exact fp32 multiply-reduce (same MXU-rounding rationale as
    _pe_phase: M carries frequencies up to 2^max_freq)."""
    cols = [jnp.sum(d * M[c:c + 1, :], axis=1, keepdims=True) for c in range(3)]
    return jnp.concatenate(cols, axis=-1)


def _pe_in_kernel(x: jnp.ndarray, M: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """Reference-ordered PE: [x, sin(x @ M + phase)] (see
    core/encoding.positional_encoding_fused). M/phase arrive as kernel
    operands (pallas forbids captured traced constants)."""
    return jnp.concatenate([x, jnp.sin(_pe_phase(x, M, phase))], axis=-1)


def _mm(a: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(a, w, preferred_element_type=jnp.float32) + b


def _field_kernel(
    pts_ref, dirs_ref, m_pts_ref, ph_pts_ref, m_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], multires: int, multires_views: int,
    use_semantics: bool, sem_with_coord: bool, compute_dtype,
):
    """One point-block: PE -> trunk (+skip) -> heads -> raw channels."""
    n_w = depth + 4 + (2 if use_semantics else 0)  # trunk + alpha/feat/views/rgb + sem
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]

    pts = pts_ref[:].astype(jnp.float32)
    emb = _pe_in_kernel(pts, m_pts_ref[:], ph_pts_ref[:]).astype(compute_dtype)

    it = iter(range(n_w))
    h = emb
    for i in range(depth):
        k = next(it)
        # cast activations back to the compute dtype: a mixed f32 x bf16 dot
        # promotes to an f32 MXU pass, silently tripling matmul cost
        h = jnp.maximum(
            _mm(h, w_refs[k][:].astype(compute_dtype), b_refs[k][:]), 0.0
        ).astype(compute_dtype)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=-1)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    alpha = _mm(h, w_refs[k_alpha][:].astype(compute_dtype), b_refs[k_alpha][:])

    sem = None
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=-1) if sem_with_coord else h
        s = jnp.maximum(_mm(sem_in, w_refs[k_s0][:].astype(compute_dtype), b_refs[k_s0][:]), 0.0)
        sem = _mm(s, w_refs[k_s1][:].astype(compute_dtype), b_refs[k_s1][:])

    dirs = dirs_ref[:].astype(jnp.float32)
    demb = _pe_in_kernel(dirs, m_dirs_ref[:], ph_dirs_ref[:]).astype(compute_dtype)
    feat = _mm(h, w_refs[k_feat][:].astype(compute_dtype), b_refs[k_feat][:])
    hv = jnp.concatenate([feat.astype(compute_dtype), demb], axis=-1)
    hv = jnp.maximum(_mm(hv, w_refs[k_views][:].astype(compute_dtype), b_refs[k_views][:]), 0.0)
    rgb = _mm(hv, w_refs[k_rgb][:].astype(compute_dtype), b_refs[k_rgb][:])

    parts = [rgb, alpha] + ([sem] if use_semantics else [])
    out_ref[:] = jnp.concatenate(parts, axis=-1).astype(jnp.float32)


def _sigma_kernel(pts_ref, m_pts_ref, ph_pts_ref, *refs,
                  depth: int, skips: Tuple[int, ...], compute_dtype):
    """Density-only field: PE -> trunk (+skip) -> alpha head. Used for the
    coarse pass when only importance-sampling weights are needed (eval/video
    renders) — skips the feature/views/rgb/semantic heads entirely, ~26% of
    the coarse field's padded MXU work."""
    n_w = depth + 1
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]

    pts = pts_ref[:].astype(jnp.float32)
    emb = _pe_in_kernel(pts, m_pts_ref[:], ph_pts_ref[:]).astype(compute_dtype)
    h = emb
    for i in range(depth):
        h = jnp.maximum(
            _mm(h, w_refs[i][:].astype(compute_dtype), b_refs[i][:]), 0.0
        ).astype(compute_dtype)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=-1)
    out_ref[:] = _mm(h, w_refs[depth][:].astype(compute_dtype),
                     b_refs[depth][:]).astype(jnp.float32)


def _sigma_forward(ws, bs, pts, depth, skips, multires, compute_dtype_name,
                   block: int = 2048, interpret: Optional[bool] = None):
    """Forward-only launch of the density kernel (no VJP: eval paths only)."""
    N = pts.shape[0]
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if FWD_BLOCK is not None:
        block = FWD_BLOCK
    blk = min(block, max(N, 8))
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
    ws = tuple(w.astype(compute_dtype) for w in ws)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from nerfsos_tpu.core.encoding import _trig_matmul_consts

    m_pts, ph_pts = _trig_matmul_consts(3, multires, float(multires - 1), True)
    pe_args = tuple(jnp.asarray(a) for a in (m_pts, ph_pts))
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sigma_kernel, depth=depth, skips=skips,
                          compute_dtype=compute_dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs],
        ],
        out_specs=pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk, 1), jnp.float32),
        interpret=interpret,
    )(pts, *pe_args, *ws, *bs)
    return out[:N] if pad else out


def fused_sigma_apply(params: Dict[str, Any], pts: jnp.ndarray, cfg,
                      depth: Optional[int] = None) -> jnp.ndarray:
    """Density-only twin of ``fused_field_apply``: [..., S, 3] -> [..., S, 1].

    Matches raw[..., 3:4] of the full field bit-for-bit (same kernels, same
    ordering). Eval-only — no custom VJP is attached.
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    names = [f"pts_linears_{i}" for i in range(depth)] + ["alpha_linear"]
    ws = tuple(mlp[n]["kernel"] for n in names)
    bs = tuple(mlp[n]["bias"] for n in names)
    lead = pts.shape[:-1]
    out = _sigma_forward(ws, bs, pts.reshape(-1, 3), depth, (4,),
                         cfg.multires, cfg.compute_dtype)
    return out.reshape(*lead, 1)


def _flatten_mlp_params(mlp: Dict[str, Any], depth: int, use_semantics: bool):
    """Order: trunk 0..depth-1, alpha, feature, views_0, rgb [, sem_0, sem_1]."""
    names = [f"pts_linears_{i}" for i in range(depth)]
    names += ["alpha_linear", "feature_linear", "views_linears_0", "rgb_linear"]
    if use_semantics:
        names += ["sem_0", "sem_1"]
    ws = [mlp[n]["kernel"] for n in names]
    bs = [mlp[n]["bias"] for n in names]
    return ws, bs


def supports_fused(cfg) -> bool:
    """The fused kernel covers the flagship configuration."""
    return (
        cfg.use_viewdirs and cfg.use_embed and not cfg.conv_embed
        and (not cfg.use_semantics or (cfg.sem_layer <= 2 and not cfg.sem_with_geo))
        and tuple((4,)) == (4,)
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11)
)
def _fused_apply(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                 use_semantics, sem_with_coord, compute_dtype_name,
                 input_grads=True, bwd_block=None):
    return _fused_forward(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                          use_semantics, sem_with_coord, compute_dtype_name)


def _fused_forward(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                   use_semantics, sem_with_coord, compute_dtype_name,
                   block: int = 2048, interpret: Optional[bool] = None):
    pts, dirs = pts_dirs
    N = pts.shape[0]
    out_ch = 4 + (ws[-1].shape[-1] if use_semantics else 0)
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32

    if FWD_BLOCK is not None:
        block = FWD_BLOCK
    blk = min(block, max(N, 8))
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)], 0)

    # Pre-cast weights to the compute dtype OUTSIDE the kernel: halves the
    # weight VMEM footprint/DMA and deletes a per-block convert. Biases stay
    # fp32 (added after the fp32-accumulated dot).
    ws = tuple(w.astype(compute_dtype) for w in ws)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _field_kernel, depth=depth, skips=skips, multires=multires,
        multires_views=multires_views, use_semantics=use_semantics,
        sem_with_coord=sem_with_coord, compute_dtype=compute_dtype,
    )
    from nerfsos_tpu.core.encoding import _trig_matmul_consts

    m_pts, ph_pts = _trig_matmul_consts(3, multires, float(multires - 1), True)
    m_dirs, ph_dirs = _trig_matmul_consts(3, multires_views, float(multires_views - 1), True)
    pe_args = tuple(jnp.asarray(a) for a in (m_pts, ph_pts, m_dirs, ph_dirs))

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs],
        ],
        out_specs=pl.BlockSpec((blk, out_ch), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * blk, out_ch), jnp.float32),
        interpret=interpret,
    )(pts, dirs, *pe_args, *ws, *bs)
    return out[:N] if pad else out


def _xla_reference(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                   use_semantics, sem_with_coord):
    """Pure-jnp twin of the kernel (used for the backward pass and tests)."""
    from nerfsos_tpu.core.encoding import positional_encoding

    pts, dirs = pts_dirs
    emb = positional_encoding(pts, multires, float(multires - 1))
    it = iter(range(len(ws)))
    h = emb
    for i in range(depth):
        k = next(it)
        h = jax.nn.relu(h @ ws[k] + bs[k])
        if i in skips:
            h = jnp.concatenate([emb, h], axis=-1)
    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    alpha = h @ ws[k_alpha] + bs[k_alpha]
    sem = None
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=-1) if sem_with_coord else h
        s = jax.nn.relu(sem_in @ ws[k_s0] + bs[k_s0])
        sem = s @ ws[k_s1] + bs[k_s1]
    demb = positional_encoding(dirs, multires_views, float(multires_views - 1))
    feat = h @ ws[k_feat] + bs[k_feat]
    hv = jax.nn.relu(jnp.concatenate([feat, demb], -1) @ ws[k_views] + bs[k_views])
    rgb = hv @ ws[k_rgb] + bs[k_rgb]
    parts = [rgb, alpha] + ([sem] if use_semantics else [])
    return jnp.concatenate(parts, axis=-1)


def _fused_fwd(ws, bs, pts_dirs, *static):
    # static = (..., compute_dtype_name, input_grads, bwd_block); the forward
    # consumes neither — they must not spill into _fused_forward's `block`.
    return _fused_forward(ws, bs, pts_dirs, *static[:7]), (ws, bs, pts_dirs)


# --------------------------------------------------------------------------
# Fused Pallas BACKWARD: recompute the forward activations in VMEM per point
# block (cheap — same fused chain), then run the full reverse sweep in-kernel.
# Weight/bias grads accumulate in fp32 output buffers that stay VMEM-resident
# across the sequential TPU grid (constant index_map = the standard reduction
# pattern); input grads (dpts/ddirs) stream out per block. This replaces the
# round-1 backward (jax.vjp of the pure-XLA twin), whose HBM-bound layer-by-
# layer matmuls made training 4.3x slower than rendering.
# --------------------------------------------------------------------------


def _tm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a^T @ b: [K, M], [K, N] -> [M, N], fp32 accumulate."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mt(a: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """a @ w^T: [M, N], [K, N] -> [M, K], fp32 accumulate."""
    return jax.lax.dot_general(a, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _relu_bwd(act: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Zero d where the (post-relu) activation is 0. Compared in fp32 —
    Mosaic on this toolchain rejects bf16 comparisons."""
    return jnp.where(act.astype(jnp.float32) > 0, d, 0.0)


def _field_bwd_kernel(
    pts_ref, dirs_ref, g_ref, m_pts_ref, ph_pts_ref, m_dirs_ref, ph_dirs_ref,
    *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, input_grads: bool,
):
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    dw_refs = refs[2 * n_w:3 * n_w]
    db_refs = refs[3 * n_w:4 * n_w]
    if input_grads:
        dpts_ref, ddirs_ref = refs[4 * n_w], refs[4 * n_w + 1]

    i_blk = pl.program_id(0)

    @pl.when(i_blk == 0)
    def _init():
        for r in dw_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    cd = compute_dtype

    # ---- forward recompute, saving what the reverse sweep needs ----------
    pts = pts_ref[:].astype(jnp.float32)
    pre_p = _pe_phase(pts, m_pts_ref[:], ph_pts_ref[:])  # exact fp32 phase
    emb = jnp.concatenate([pts, jnp.sin(pre_p)], axis=-1).astype(cd)

    it = iter(range(n_w))
    acts = []  # post-relu activation of each trunk layer, compute dtype
    ins = [emb]  # input of each trunk layer
    h = emb
    for i in range(depth):
        k = next(it)
        a = jnp.maximum(_mm(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        acts.append(a)
        h = jnp.concatenate([emb, a], axis=-1) if i in skips else a
        if i + 1 < depth:
            ins.append(h)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=-1) if sem_with_coord else h
        s = jnp.maximum(_mm(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)

    dirs = dirs_ref[:].astype(jnp.float32)
    pre_d = _pe_phase(dirs, m_dirs_ref[:], ph_dirs_ref[:])  # exact fp32 phase
    demb = jnp.concatenate([dirs, jnp.sin(pre_d)], axis=-1).astype(cd)
    feat = _mm(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv_in = jnp.concatenate([feat, demb], axis=-1)
    hv = jnp.maximum(_mm(hv_in, w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)

    # ---- reverse sweep ----------------------------------------------------
    g = g_ref[:].astype(jnp.float32)  # [blk, 3 + 1 + sem]
    d_rgb = g[:, 0:3].astype(cd)
    d_alpha = g[:, 3:4].astype(cd)

    # rgb head
    dw_refs[k_rgb][:] += _tm(hv, d_rgb)
    db_refs[k_rgb][:] += jnp.sum(d_rgb.astype(jnp.float32), 0, keepdims=True)
    dhv = _mt(d_rgb, w_refs[k_rgb][:])
    dhv = _relu_bwd(hv, dhv).astype(cd)

    # views layer
    dw_refs[k_views][:] += _tm(hv_in, dhv)
    db_refs[k_views][:] += jnp.sum(dhv.astype(jnp.float32), 0, keepdims=True)
    dhv_in = _mt(dhv, w_refs[k_views][:])
    W_feat_out = feat.shape[-1]
    d_feat = dhv_in[:, :W_feat_out].astype(cd)
    d_demb = dhv_in[:, W_feat_out:]

    # dirs <- PE backward (raw-channel passthrough + sin chain rule)
    if input_grads:
        d_sin_d = (d_demb[:, 3:] * jnp.cos(pre_d)).astype(jnp.float32)
        ddirs_ref[:] = d_demb[:, :3] + _pe_phase_t(d_sin_d, m_dirs_ref[:])

    # feature head
    dw_refs[k_feat][:] += _tm(h, d_feat)
    db_refs[k_feat][:] += jnp.sum(d_feat.astype(jnp.float32), 0, keepdims=True)
    dh = _mt(d_feat, w_refs[k_feat][:])

    # alpha head
    dw_refs[k_alpha][:] += _tm(h, d_alpha)
    db_refs[k_alpha][:] += jnp.sum(d_alpha.astype(jnp.float32), 0, keepdims=True)
    dh += _mt(d_alpha, w_refs[k_alpha][:])

    demb_acc = jnp.zeros_like(emb, dtype=jnp.float32) if input_grads else None

    # semantic head
    if use_semantics:
        d_sem = g[:, 4:].astype(cd)
        dw_refs[k_s1][:] += _tm(s, d_sem)
        db_refs[k_s1][:] += jnp.sum(d_sem.astype(jnp.float32), 0, keepdims=True)
        ds = _mt(d_sem, w_refs[k_s1][:])
        ds = _relu_bwd(s, ds).astype(cd)
        dw_refs[k_s0][:] += _tm(sem_in, ds)
        db_refs[k_s0][:] += jnp.sum(ds.astype(jnp.float32), 0, keepdims=True)
        dsem_in = _mt(ds, w_refs[k_s0][:])
        if sem_with_coord:
            dh += dsem_in[:, :h.shape[-1]]
            if input_grads:
                demb_acc += dsem_in[:, h.shape[-1]:]
        else:
            dh += dsem_in

    # trunk, reversed (skip layers split their concat gradient)
    dcur = dh
    for i in reversed(range(depth)):
        if i in skips:
            if input_grads:
                demb_acc += dcur[:, :emb.shape[-1]]
            dcur = dcur[:, emb.shape[-1]:]
        dpre = _relu_bwd(acts[i], dcur).astype(cd)
        dw_refs[i][:] += _tm(ins[i], dpre)
        db_refs[i][:] += jnp.sum(dpre.astype(jnp.float32), 0, keepdims=True)
        dcur = _mt(dpre, w_refs[i][:])

    # pts <- PE backward
    if input_grads:
        demb_acc += dcur
        d_sin_p = (demb_acc[:, 3:] * jnp.cos(pre_p)).astype(jnp.float32)
        dpts_ref[:] = demb_acc[:, :3] + _pe_phase_t(d_sin_p, m_pts_ref[:])


def _fused_backward(ws, bs, pts_dirs, g, depth, skips, multires, multires_views,
                    use_semantics, sem_with_coord, compute_dtype_name,
                    block: Optional[int] = None, interpret: Optional[bool] = None,
                    input_grads: bool = True):
    pts, dirs = pts_dirs
    N = pts.shape[0]
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if block is None:
        # VMEM budget: saved activations + weights + fp32 grad accumulators
        # (~16 MB limit; fp32 activations double the footprint). 1024 measured
        # 2.6% faster than 512 on-chip (fewer sequential grid steps), same
        # numerics to 1e-7 (tools/perf_block_sweep.py).
        block = BWD_BLOCK or (1024 if compute_dtype == jnp.bfloat16 else 256)

    blk = min(block, max(N, 8))
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], 0)
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)], 0)
        g = jnp.concatenate([g, jnp.zeros((pad, g.shape[1]), g.dtype)], 0)

    w_shapes = [w.shape for w in ws]
    b_shapes = [b.shape for b in bs]
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_f = tuple(b.astype(jnp.float32) for b in bs)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _field_bwd_kernel, depth=depth, skips=skips,
        use_semantics=use_semantics, sem_with_coord=sem_with_coord,
        compute_dtype=compute_dtype, input_grads=input_grads,
    )
    from nerfsos_tpu.core.encoding import _trig_matmul_consts

    m_pts, ph_pts = _trig_matmul_consts(3, multires, float(multires - 1), True)
    m_dirs, ph_dirs = _trig_matmul_consts(3, multires_views, float(multires_views - 1), True)
    pe_args = tuple(jnp.asarray(a) for a in (m_pts, ph_pts, m_dirs, ph_dirs))

    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes]          # dws
        + [jax.ShapeDtypeStruct((1, s[0]), jnp.float32) for s in b_shapes]  # dbs
    )
    out_specs = (
        [acc2d(s) for s in w_shapes]
        + [acc2d((1, s[0])) for s in b_shapes]
    )
    if input_grads:
        out_shapes += [jax.ShapeDtypeStruct((n_blocks * blk, 3), jnp.float32),
                       jax.ShapeDtypeStruct((n_blocks * blk, 3), jnp.float32)]
        out_specs += [pl.BlockSpec((blk, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, g.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_f],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pts, dirs, g, *pe_args, *ws_c, *bs_f)

    n_w = len(ws)
    dws = tuple(outs[i].astype(ws[i].dtype) for i in range(n_w))
    dbs = tuple(outs[n_w + i][0].astype(bs[i].dtype) for i in range(n_w))
    if not input_grads:
        # Rays are data in every shipped training path — the caller declared
        # (cfg.field_input_grads=False) that nothing upstream of pts/dirs is
        # trainable, so zeros are the exact cotangents.
        return dws, dbs, (jnp.zeros_like(pts_dirs[0]), jnp.zeros_like(pts_dirs[1]))
    dpts, ddirs = outs[2 * n_w], outs[2 * n_w + 1]
    if pad:
        dpts, ddirs = dpts[:N], ddirs[:N]
    return dws, dbs, (dpts.astype(pts_dirs[0].dtype), ddirs.astype(pts_dirs[1].dtype))


def _fused_bwd(depth, skips, multires, multires_views, use_semantics,
               sem_with_coord, compute_dtype_name, input_grads, bwd_block,
               residuals, g):
    ws, bs, pts_dirs = residuals
    return _fused_backward(ws, bs, pts_dirs, g, depth, skips, multires,
                           multires_views, use_semantics, sem_with_coord,
                           compute_dtype_name, block=bwd_block,
                           input_grads=input_grads)


def _xla_bwd(depth, skips, multires, multires_views, use_semantics,
             sem_with_coord, residuals, g):
    """Round-1 backward (vjp of the XLA twin); kept as the parity oracle."""
    ws, bs, pts_dirs = residuals
    _, vjp = jax.vjp(
        lambda w, b, pd: _xla_reference(w, b, pd, depth, skips, multires,
                                        multires_views, use_semantics, sem_with_coord),
        ws, bs, pts_dirs,
    )
    return vjp(g)


_fused_apply.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# PLANAR (channel-major) kernels: activations live as [features, points] and
# all IO is [C, N] with points on the LANE dim. Rationale (measured): the
# row-major path's [N, 3] / [N, C_out] operands tile to T(8,128) with the
# tiny minor dim padded to 128 lanes — a 42.7x HBM expansion (the pts/dirs
# buffers alone are 2 x 1.5 GB per 16384x192 render; a 65536-ray render OOMs
# at 18 GB). Planar IO makes every stream its unpadded size. The MLP math is
# identical, just transposed: h_out = W^T h_in (fp32-accumulated MXU dots),
# PE phases stay exact fp32 elementwise.
# --------------------------------------------------------------------------


def _pe_phase_pl(x3: jnp.ndarray, m_t: jnp.ndarray, ph1: jnp.ndarray) -> jnp.ndarray:
    """Planar twin of `_pe_phase`: x3 [3, blk] -> [F, blk], exact fp32.

    m_t is the [F, 3] TRANSPOSED frequency matrix, ph1 the [F, 1] phase
    column (host-side transposes of `_trig_matmul_consts`)."""
    return (ph1 + m_t[:, 0:1] * x3[0:1, :] + m_t[:, 1:2] * x3[1:2, :]
            + m_t[:, 2:3] * x3[2:3, :])


def _pe_in_kernel_pl(x3: jnp.ndarray, m_t: jnp.ndarray, ph1: jnp.ndarray) -> jnp.ndarray:
    """[x; sin(Mx + phase)] stacked on the feature (sublane) axis: [3+F, blk]."""
    return jnp.concatenate([x3, jnp.sin(_pe_phase_pl(x3, m_t, ph1))], axis=0)


def _ipe_in_kernel_pl(mean3: jnp.ndarray, cov3: jnp.ndarray,
                      m_t: jnp.ndarray) -> jnp.ndarray:
    """Planar integrated PE: exp(-var/2)*[sin(y); sin(y + pi/2)] -> [2FD, blk].

    Column (row, here) order matches ``core.encoding
    .integrated_positional_encoding``: y freq-major/channel-minor, full sin
    block then the shifted-sin (cos) block. m_t is the [F*D, 3] band matrix
    (row f*D+c holds band f in column c); variances use its elementwise
    square. Exact fp32 — same MXU-phase-rounding rationale as _pe_phase_pl.
    """
    import math as _math

    y = (m_t[:, 0:1] * mean3[0:1, :] + m_t[:, 1:2] * mean3[1:2, :]
         + m_t[:, 2:3] * mean3[2:3, :])
    m2 = m_t * m_t
    yv = (m2[:, 0:1] * cov3[0:1, :] + m2[:, 1:2] * cov3[1:2, :]
          + m2[:, 2:3] * cov3[2:3, :])
    scale = jnp.exp(-0.5 * yv)
    return jnp.concatenate(
        [scale * jnp.sin(y), scale * jnp.sin(y + 0.5 * _math.pi)], axis=0)


def _mm_pl(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """W^T @ h + b: w [in, out], h [in, blk], b [out, 1] -> [out, blk] fp32."""
    return jax.lax.dot_general(w, h, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + b


def _field_kernel_pl(
    pd_ref, mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, ipe: bool = False,
):
    """Planar block: pd [6, blk] (x,y,z,dx,dy,dz rows) -> raw [C_out, blk].

    ``ipe=True`` (mip-NeRF): pd is [9, blk] (mean, cov_diag, dirs rows) and
    the position encoding is the integrated PE over diagonal Gaussians."""
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]
    cd = compute_dtype

    pd = pd_ref[:].astype(jnp.float32)
    if ipe:
        emb = _ipe_in_kernel_pl(pd[0:3], pd[3:6], mt_pts_ref[:]).astype(cd)
    else:
        emb = _pe_in_kernel_pl(pd[0:3], mt_pts_ref[:], ph_pts_ref[:]).astype(cd)

    it = iter(range(n_w))
    h = emb
    for i in range(depth):
        k = next(it)
        h = jnp.maximum(_mm_pl(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=0)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    alpha = _mm_pl(h, w_refs[k_alpha][:], b_refs[k_alpha][:])

    sem = None
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
        s = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)
        sem = _mm_pl(s, w_refs[k_s1][:], b_refs[k_s1][:])

    dirs3 = pd[6:9] if ipe else pd[3:6]
    demb = _pe_in_kernel_pl(dirs3, mt_dirs_ref[:], ph_dirs_ref[:]).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv = jnp.maximum(_mm_pl(jnp.concatenate([feat, demb], axis=0),
                            w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)
    rgb = _mm_pl(hv, w_refs[k_rgb][:], b_refs[k_rgb][:])

    parts = [rgb, alpha] + ([sem] if use_semantics else [])
    out_ref[:] = jnp.concatenate(parts, axis=0).astype(jnp.float32)


def _sigma_kernel_pl(p3_ref, mt_pts_ref, ph_pts_ref, *refs,
                     depth: int, skips: Tuple[int, ...], compute_dtype):
    """Planar density-only block: p3 [3, blk] -> sigma [1, blk]."""
    n_w = depth + 1
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]
    cd = compute_dtype

    p3 = p3_ref[:].astype(jnp.float32)
    emb = _pe_in_kernel_pl(p3, mt_pts_ref[:], ph_pts_ref[:]).astype(cd)
    h = emb
    for i in range(depth):
        h = jnp.maximum(_mm_pl(h, w_refs[i][:], b_refs[i][:]), 0.0).astype(cd)
        if i in skips:
            h = jnp.concatenate([emb, h], axis=0)
    out_ref[:] = _mm_pl(h, w_refs[depth][:], b_refs[depth][:]).astype(jnp.float32)


def _pe_consts_pl(multires: int, multires_views: Optional[int] = None):
    """Planar PE operands: transposed frequency matrices + phase columns."""
    from nerfsos_tpu.core.encoding import _trig_matmul_consts

    m_p, ph_p = _trig_matmul_consts(3, multires, float(multires - 1), True)
    out = [jnp.asarray(m_p).T, jnp.asarray(ph_p)[:, None]]
    if multires_views is not None:
        m_d, ph_d = _trig_matmul_consts(3, multires_views, float(multires_views - 1), True)
        out += [jnp.asarray(m_d).T, jnp.asarray(ph_d)[:, None]]
    return tuple(out)


def _ipe_consts_pl(multires: int, multires_views: int):
    """IPE band matrix [F*D, 3] (row f*D+c holds band f in column c — the
    freq-major/channel-minor order of `integrated_positional_encoding`), a
    dummy phase column, and the classic dirs-PE consts."""
    from nerfsos_tpu.core.encoding import _trig_matmul_consts

    bands = (2.0 ** np.linspace(0.0, float(multires - 1), multires)).astype(np.float32)
    D = 3
    M = np.zeros((multires * D, D), np.float32)
    for f in range(multires):
        for c in range(D):
            M[f * D + c, c] = bands[f]
    m_d, ph_d = _trig_matmul_consts(3, multires_views, float(multires_views - 1), True)
    return (jnp.asarray(M), jnp.zeros((multires * D, 1), jnp.float32),
            jnp.asarray(m_d).T, jnp.asarray(ph_d)[:, None])


def _planar_pad(x: jnp.ndarray, blk: int) -> Tuple[jnp.ndarray, int, int]:
    N = x.shape[1]
    n_blocks = -(-N // blk)
    pad = n_blocks * blk - N
    if pad:
        x = jnp.concatenate([x, jnp.zeros((x.shape[0], pad), x.dtype)], axis=1)
    return x, n_blocks, pad


def _fused_forward_pl(ws, bs, pd, depth, skips, multires, multires_views,
                      use_semantics, sem_with_coord, compute_dtype_name,
                      block: int = 2048, interpret: Optional[bool] = None,
                      ipe: bool = False):
    N = pd.shape[1]
    in_rows = pd.shape[0]  # 6 classic (pts+dirs), 9 ipe (mean+cov+dirs)
    out_ch = 4 + (ws[-1].shape[-1] if use_semantics else 0)
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if FWD_BLOCK is not None:
        block = FWD_BLOCK
    blk = min(block, max(N, 8))
    pd, n_blocks, pad = _planar_pad(pd, blk)
    ws = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pe_args = (_ipe_consts_pl(multires, multires_views) if ipe
               else _pe_consts_pl(multires, multires_views))
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_field_kernel_pl, depth=depth, skips=skips,
                          use_semantics=use_semantics,
                          sem_with_coord=sem_with_coord,
                          compute_dtype=compute_dtype, ipe=ipe),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((in_rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs_col],
        ],
        out_specs=pl.BlockSpec((out_ch, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_ch, n_blocks * blk), jnp.float32),
        interpret=interpret,
    )(pd, *pe_args, *ws, *bs_col)
    return out[:, :N] if pad else out


def _sigma_forward_pl(ws, bs, p3, depth, skips, multires, compute_dtype_name,
                      block: int = 2048, interpret: Optional[bool] = None):
    N = p3.shape[1]
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if FWD_BLOCK is not None:
        block = FWD_BLOCK
    blk = min(block, max(N, 8))
    p3, n_blocks, pad = _planar_pad(p3, blk)
    ws = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pe_args = _pe_consts_pl(multires)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sigma_kernel_pl, depth=depth, skips=skips,
                          compute_dtype=compute_dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((3, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws],
            *[full(b) for b in bs_col],
        ],
        out_specs=pl.BlockSpec((1, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_blocks * blk), jnp.float32),
        interpret=interpret,
    )(p3, *pe_args, *ws, *bs_col)
    return out[:, :N] if pad else out


def _field_bwd_kernel_pl(
    pd_ref, g_ref, mt_pts_ref, ph_pts_ref, mt_dirs_ref, ph_dirs_ref, *refs,
    depth: int, skips: Tuple[int, ...], use_semantics: bool,
    sem_with_coord: bool, compute_dtype, ipe: bool = False,
):
    """Planar backward: recompute forward in VMEM, reverse sweep, accumulate
    dW/db in fp32 VMEM buffers across the sequential grid. Input (pd) grads
    are NOT computed — the planar path is only used with
    ``field_input_grads=False`` (rays are data in every shipped trainer)."""
    n_w = depth + 4 + (2 if use_semantics else 0)
    w_refs = refs[:n_w]
    b_refs = refs[n_w:2 * n_w]
    dw_refs = refs[2 * n_w:3 * n_w]
    db_refs = refs[3 * n_w:4 * n_w]
    cd = compute_dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in dw_refs + db_refs:
            r[:] = jnp.zeros_like(r)

    def tm(a, b):
        """a [in, blk], b [out, blk] -> dW [in, out], fp32 accumulate.

        Operands are cast to one dtype first: Mosaic's lowering of a MIXED
        bf16 x f32 dot emits an invalid vector.broadcast (verification
        failure seen 2026-08-16 on this toolchain)."""
        return jax.lax.dot_general(a.astype(cd), b.astype(cd),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def wd(w, d):
        """W [in, out] @ d [out, blk] -> [in, blk], fp32 accumulate."""
        return jax.lax.dot_general(w.astype(cd), d.astype(cd),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    # ---- forward recompute (planar) --------------------------------------
    pd = pd_ref[:].astype(jnp.float32)
    if ipe:
        emb = _ipe_in_kernel_pl(pd[0:3], pd[3:6], mt_pts_ref[:]).astype(cd)
    else:
        emb = _pe_in_kernel_pl(pd[0:3], mt_pts_ref[:], ph_pts_ref[:]).astype(cd)

    it = iter(range(n_w))
    acts = []
    ins = [emb]
    h = emb
    for i in range(depth):
        k = next(it)
        a = jnp.maximum(_mm_pl(h, w_refs[k][:], b_refs[k][:]), 0.0).astype(cd)
        acts.append(a)
        h = jnp.concatenate([emb, a], axis=0) if i in skips else a
        if i + 1 < depth:
            ins.append(h)

    k_alpha, k_feat, k_views, k_rgb = next(it), next(it), next(it), next(it)
    if use_semantics:
        k_s0, k_s1 = next(it), next(it)
        sem_in = jnp.concatenate([h, emb], axis=0) if sem_with_coord else h
        s = jnp.maximum(_mm_pl(sem_in, w_refs[k_s0][:], b_refs[k_s0][:]), 0.0).astype(cd)

    dirs3 = pd[6:9] if ipe else pd[3:6]
    demb = _pe_in_kernel_pl(dirs3, mt_dirs_ref[:], ph_dirs_ref[:]).astype(cd)
    feat = _mm_pl(h, w_refs[k_feat][:], b_refs[k_feat][:]).astype(cd)
    hv_in = jnp.concatenate([feat, demb], axis=0)
    hv = jnp.maximum(_mm_pl(hv_in, w_refs[k_views][:], b_refs[k_views][:]), 0.0).astype(cd)

    # ---- reverse sweep ----------------------------------------------------
    g = g_ref[:].astype(jnp.float32)  # [3 + 1 + sem, blk]
    d_rgb = g[0:3, :].astype(cd)
    d_alpha = g[3:4, :].astype(cd)

    dw_refs[k_rgb][:] += tm(hv, d_rgb)
    db_refs[k_rgb][:] += jnp.sum(d_rgb.astype(jnp.float32), 1, keepdims=True)
    dhv = _relu_bwd(hv, wd(w_refs[k_rgb][:], d_rgb)).astype(cd)

    dw_refs[k_views][:] += tm(hv_in, dhv)
    db_refs[k_views][:] += jnp.sum(dhv.astype(jnp.float32), 1, keepdims=True)
    dhv_in = wd(w_refs[k_views][:], dhv)
    d_feat = dhv_in[:feat.shape[0], :].astype(cd)

    dw_refs[k_feat][:] += tm(h, d_feat)
    db_refs[k_feat][:] += jnp.sum(d_feat.astype(jnp.float32), 1, keepdims=True)
    dh = wd(w_refs[k_feat][:], d_feat)

    # Mosaic cannot lower the [in,blk] x [1,blk] -> [in,1] dot (the single-
    # output-lane a@b^T case emits an invalid bf16->f32 vector.broadcast on
    # this toolchain; isolated 2026-08-16). Pad the alpha cotangent to two
    # rows and keep column 0.
    d_alpha2 = jnp.concatenate([d_alpha, jnp.zeros_like(d_alpha)], axis=0)
    dw_refs[k_alpha][:] += tm(h, d_alpha2)[:, 0:1]
    db_refs[k_alpha][:] += jnp.sum(d_alpha.astype(jnp.float32), 1, keepdims=True)
    dh += wd(w_refs[k_alpha][:], d_alpha)

    if use_semantics:
        d_sem = g[4:, :].astype(cd)
        dw_refs[k_s1][:] += tm(s, d_sem)
        db_refs[k_s1][:] += jnp.sum(d_sem.astype(jnp.float32), 1, keepdims=True)
        ds = _relu_bwd(s, wd(w_refs[k_s1][:], d_sem)).astype(cd)
        dw_refs[k_s0][:] += tm(sem_in, ds)
        db_refs[k_s0][:] += jnp.sum(ds.astype(jnp.float32), 1, keepdims=True)
        dsem_in = wd(w_refs[k_s0][:], ds)
        dh += dsem_in[:h.shape[0], :] if sem_with_coord else dsem_in

    dcur = dh
    for i in reversed(range(depth)):
        if i in skips:
            dcur = dcur[emb.shape[0]:, :]  # emb rows: input grads not needed
        dpre = _relu_bwd(acts[i], dcur).astype(cd)
        dw_refs[i][:] += tm(ins[i], dpre)
        db_refs[i][:] += jnp.sum(dpre.astype(jnp.float32), 1, keepdims=True)
        dcur = wd(w_refs[i][:], dpre)


def _fused_backward_pl(ws, bs, pd, g, depth, skips, multires, multires_views,
                       use_semantics, sem_with_coord, compute_dtype_name,
                       block: Optional[int] = None,
                       interpret: Optional[bool] = None, ipe: bool = False):
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    if block is None:
        block = BWD_BLOCK or (1024 if compute_dtype == jnp.bfloat16 else 256)
    N = pd.shape[1]
    in_rows = pd.shape[0]
    blk = min(block, max(N, 8))
    pd, n_blocks, pad = _planar_pad(pd, blk)
    if pad:
        g = jnp.concatenate([g, jnp.zeros((g.shape[0], pad), g.dtype)], axis=1)

    w_shapes = [w.shape for w in ws]
    b_sizes = [b.shape[0] for b in bs]
    ws_c = tuple(w.astype(compute_dtype) for w in ws)
    bs_col = tuple(b.astype(jnp.float32).reshape(-1, 1) for b in bs)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    pe_args = (_ipe_consts_pl(multires, multires_views) if ipe
               else _pe_consts_pl(multires, multires_views))
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                    memory_space=pltpu.VMEM)
    acc2d = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out_shapes = (
        [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes]
        + [jax.ShapeDtypeStruct((n, 1), jnp.float32) for n in b_sizes]
    )
    out_specs = [acc2d(s) for s in w_shapes] + [acc2d((n, 1)) for n in b_sizes]
    outs = pl.pallas_call(
        functools.partial(_field_bwd_kernel_pl, depth=depth, skips=skips,
                          use_semantics=use_semantics,
                          sem_with_coord=sem_with_coord,
                          compute_dtype=compute_dtype, ipe=ipe),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((in_rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.shape[0], blk), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[full(a) for a in pe_args],
            *[full(w) for w in ws_c],
            *[full(b) for b in bs_col],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pd, g, *pe_args, *ws_c, *bs_col)

    n_w = len(ws)
    dws = tuple(outs[i].astype(ws[i].dtype) for i in range(n_w))
    dbs = tuple(outs[n_w + i][:, 0].astype(bs[i].dtype) for i in range(n_w))
    return dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11))
def _fused_apply_pl(ws, bs, pd, depth, skips, multires, multires_views,
                    use_semantics, sem_with_coord, compute_dtype_name,
                    bwd_block=None, ipe=False):
    return _fused_forward_pl(ws, bs, pd, depth, skips, multires,
                             multires_views, use_semantics, sem_with_coord,
                             compute_dtype_name, ipe=ipe)


def _fused_fwd_pl(ws, bs, pd, *static):
    # static = (depth, skips, multires, multires_views, use_semantics,
    # sem_with_coord, compute_dtype_name, bwd_block, ipe); the forward takes
    # everything except bwd_block.
    return (_fused_forward_pl(ws, bs, pd, *static[:7], ipe=static[8]),
            (ws, bs, pd))


def _fused_bwd_pl(depth, skips, multires, multires_views, use_semantics,
                  sem_with_coord, compute_dtype_name, bwd_block, ipe,
                  residuals, g):
    ws, bs, pd = residuals
    dws, dbs = _fused_backward_pl(ws, bs, pd, g, depth, skips, multires,
                                  multires_views, use_semantics,
                                  sem_with_coord, compute_dtype_name,
                                  block=bwd_block, ipe=ipe)
    # pd is rays-as-data on every planar call site (field_input_grads=False
    # is a hard precondition checked in fused_field_apply_planar).
    return dws, dbs, jnp.zeros_like(pd)


_fused_apply_pl.defvjp(_fused_fwd_pl, _fused_bwd_pl)


def fused_field_apply_planar(params: Dict[str, Any], pd: jnp.ndarray, cfg,
                             depth: Optional[int] = None) -> jnp.ndarray:
    """Planar fused field: pd [6, N] (x,y,z,dx,dy,dz rows) -> raw [C_out, N].

    Same math as ``fused_field_apply`` with channel-major IO (see the planar
    section header). Requires ``cfg.field_input_grads=False`` — the backward
    returns zero cotangents for pd.
    """
    if getattr(cfg, "field_input_grads", False):
        raise ValueError("planar fused field does not compute input grads; "
                         "use fused_field_apply (row-major) instead")
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, cfg.use_semantics)
    return _fused_apply_pl(
        tuple(ws), tuple(bs), pd,
        depth, (4,), cfg.multires, cfg.multires_views,
        cfg.use_semantics, cfg.sem_with_coord, cfg.compute_dtype,
        getattr(cfg, "field_bwd_block", None), False,
    )


def fused_mip_apply_planar(params: Dict[str, Any], pd: jnp.ndarray, cfg,
                           depth: Optional[int] = None) -> jnp.ndarray:
    """Planar fused mip-NeRF field: pd [9, N] (mean, cov_diag, dirs rows) ->
    raw [4, N] (rgb, sigma-last, matching ``mip_volumetric_render``).

    Integrated PE over diagonal Gaussians computed in-kernel at exact fp32
    (`_ipe_in_kernel_pl`); same trunk/heads as the classic kernel without the
    semantic branch. Requires ``field_input_grads=False``.
    """
    if getattr(cfg, "field_input_grads", False):
        raise ValueError("planar fused mip field does not compute input grads")
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, False)
    return _fused_apply_pl(
        tuple(ws), tuple(bs), pd,
        depth, (4,), cfg.multires, cfg.multires_views,
        False, False, cfg.compute_dtype,
        getattr(cfg, "field_bwd_block", None), True,
    )


def fused_sigma_apply_planar(params: Dict[str, Any], p3: jnp.ndarray, cfg,
                             depth: Optional[int] = None) -> jnp.ndarray:
    """Planar density-only field: p3 [3, N] -> sigma [N] (forward-only)."""
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    names = [f"pts_linears_{i}" for i in range(depth)] + ["alpha_linear"]
    ws = tuple(mlp[n]["kernel"] for n in names)
    bs = tuple(mlp[n]["bias"] for n in names)
    return _sigma_forward_pl(ws, bs, p3, depth, (4,), cfg.multires,
                             cfg.compute_dtype)[0]


def fused_field_apply(params: Dict[str, Any], pts: jnp.ndarray,
                      viewdirs: jnp.ndarray, cfg,
                      depth: Optional[int] = None) -> jnp.ndarray:
    """Drop-in replacement for ``NeRFField.apply`` on supported configs.

    Args:
      params: one field's param tree (contains ``mlp``).
      pts:      [..., S, 3]; viewdirs: [..., 3] (broadcast over S).
      depth:  trunk depth of THIS field (netdepth vs netdepth_fine).
    Returns:
      raw [..., S, 4+sem] float32.
    """
    mlp = params["mlp"]
    depth = cfg.netdepth if depth is None else depth
    ws, bs = _flatten_mlp_params(mlp, depth, cfg.use_semantics)
    lead = pts.shape[:-1]
    flat_pts = pts.reshape(-1, 3)
    flat_dirs = jnp.broadcast_to(viewdirs[..., None, :], pts.shape).reshape(-1, 3)
    out = _fused_apply(
        tuple(ws), tuple(bs), (flat_pts, flat_dirs),
        depth, (4,), cfg.multires, cfg.multires_views,
        cfg.use_semantics, cfg.sem_with_coord, cfg.compute_dtype,
        getattr(cfg, "field_input_grads", True),
        getattr(cfg, "field_bwd_block", None),
    )
    return out.reshape(*lead, out.shape[-1])
