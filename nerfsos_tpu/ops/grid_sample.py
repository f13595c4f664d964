"""Bilinear grid sampling with torch `F.grid_sample` semantics.

The appearance correlation loss needs exact parity with
``F.grid_sample(t, coords, padding_mode='border', align_corners=True)``
(reference ``utils/image.py:303-304`` in VITA-Group/NeRF-SOS) — the loss
VALUE depends on these conventions. Implemented as clamped gathers + lerp
(pure VPU work; XLA fuses the whole thing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(t: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Args:
      t:    [N, C, H, W] source.
      grid: [N, Hg, Wg, 2] sample coords in [-1, 1]; grid[..., 0] is x (width),
            grid[..., 1] is y (height).
    Returns:
      [N, C, Hg, Wg]. align_corners=True (-1 -> 0, +1 -> size-1); border
      padding (indices clamped).
    """
    N, C, H, W = t.shape
    x = (grid[..., 0] + 1.0) / 2.0 * (W - 1)
    y = (grid[..., 1] + 1.0) / 2.0 * (H - 1)
    # border padding: clamp the continuous coordinate first (matches torch,
    # which clamps the four gather indices — identical result for bilinear)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)

    if H * W <= 1024:
        # TPU path: per-element dynamic gathers are the classic TPU pathology
        # (measured throughout this repo — see core/sampling.py). For small
        # sources (the DINO 14x14 feature maps here), build the bilinear
        # interpolation matrix [N, Hg, Wg, H*W] and contract instead: one
        # fused elementwise+einsum, no gathers.
        fx = x - x0
        fy = y - y0
        q = jnp.arange(H * W)
        wmat = ((y0 * W + x0)[..., None] == q) * ((1 - fx) * (1 - fy))[..., None] \
             + ((y0 * W + x1)[..., None] == q) * (fx * (1 - fy))[..., None] \
             + ((y1 * W + x0)[..., None] == q) * ((1 - fx) * fy)[..., None] \
             + ((y1 * W + x1)[..., None] == q) * (fx * fy)[..., None]
        # HIGHEST: the default TPU matmul would bf16-round both the weights
        # and the features; the gather path this replaces is exact fp32.
        return jnp.einsum("nhwq,ncq->nchw", wmat.astype(t.dtype),
                          t.reshape(N, C, H * W),
                          precision=jax.lax.Precision.HIGHEST)

    fx = (x - x0)[:, None]  # [N, 1, Hg, Wg] broadcast over C
    fy = (y - y0)[:, None]

    batch = jnp.arange(N)[:, None, None]

    def gather(yi, xi):
        # t[n, :, yi[n,h,w], xi[n,h,w]] -> [N, Hg, Wg, C] -> [N, C, Hg, Wg]
        return t[batch, :, yi, xi].transpose(0, 3, 1, 2)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
