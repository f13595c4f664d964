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


def _pe_in_kernel(x: jnp.ndarray, M: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """Reference-ordered PE as one matmul + one sin (see
    core/encoding.positional_encoding_fused): 2F tiny 3-lane trig ops and a
    2F-way lane concatenate are hostile to the VPU; sin(x @ M + phase) is one
    well-tiled op. M/phase arrive as kernel operands (pallas forbids captured
    traced constants)."""
    emb = jnp.sin(jnp.dot(x, M, preferred_element_type=jnp.float32) + phase)
    return jnp.concatenate([x, emb], axis=-1)


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
        h = jnp.maximum(_mm(h, w_refs[k][:].astype(compute_dtype), b_refs[k][:]), 0.0)
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
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9)
)
def _fused_apply(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                 use_semantics, sem_with_coord, compute_dtype_name):
    return _fused_forward(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                          use_semantics, sem_with_coord, compute_dtype_name)


def _fused_forward(ws, bs, pts_dirs, depth, skips, multires, multires_views,
                   use_semantics, sem_with_coord, compute_dtype_name,
                   block: int = 2048, interpret: Optional[bool] = None):
    pts, dirs = pts_dirs
    N = pts.shape[0]
    out_ch = 4 + (ws[-1].shape[-1] if use_semantics else 0)
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32

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
    return _fused_forward(ws, bs, pts_dirs, *static), (ws, bs, pts_dirs)


def _fused_bwd(depth, skips, multires, multires_views, use_semantics,
               sem_with_coord, compute_dtype_name, residuals, g):
    ws, bs, pts_dirs = residuals
    _, vjp = jax.vjp(
        lambda w, b, pd: _xla_reference(w, b, pd, depth, skips, multires,
                                        multires_views, use_semantics, sem_with_coord),
        ws, bs, pts_dirs,
    )
    return vjp(g)


_fused_apply.defvjp(_fused_fwd, _fused_bwd)


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
    )
    return out.reshape(*lead, out.shape[-1])
