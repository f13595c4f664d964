"""NeRF MLP backbones (flax) with the NeRF-SOS semantic head.

TPU-native rewrite of the reference MLP (``models/nerf_mlp.py:24-129`` in
VITA-Group/NeRF-SOS). Structure parity (required for torch-checkpoint
conversion, see ``engines/checkpoint.py``):

- depth x width trunk with a skip concat ``[pts_embed, h]`` AFTER the relu of
  every layer index in ``skips`` (reference ``:70-74``),
- viewdirs branch: ``alpha_linear`` (W->1), ``feature_linear`` (W->W), a single
  ``views_linears`` (W+dirs -> W/2), ``rgb_linear`` (reference ``:43-53``),
- semantic head: 2-layer (W[+pts_embed] -> W/2 -> sem_dim) or deeper when
  ``sem_layer > 2`` (reference ``:57-63``),
- optional ``geo_map_sem`` gate mapping raw alpha -> a sem_dim multiplier
  (reference ``:64, 81-83``),
- output channel order ``[rgb, alpha, semantics]`` (reference ``:93-96``).

TPU-first deltas: activations can run in bfloat16 on the MXU while params stay
float32 (``compute_dtype``); there is no chunking here — memory is bounded by
the rematerialized block scan in ``models/nerf.py``.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class NeRFMLP(nn.Module):
    """Point-wise NeRF MLP: (pts_embed, views_embed) -> raw channels."""

    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    output_ch: int = 4  # rgb(output_ch-1) + alpha when use_viewdirs
    use_semantics: bool = False
    sem_layer: int = 2
    sem_dim: int = 2
    sem_with_coord: bool = False
    sem_with_geo: bool = False
    compute_dtype: Dtype = jnp.float32

    def _dense(self, features: int, name: str) -> nn.Dense:
        return nn.Dense(features, name=name, dtype=self.compute_dtype,
                        param_dtype=jnp.float32)

    @nn.compact
    def __call__(self, pts_embed: jnp.ndarray, views_embed: jnp.ndarray | None) -> jnp.ndarray:
        x = pts_embed.astype(self.compute_dtype)
        h = x
        for i in range(self.depth):
            h = nn.relu(self._dense(self.width, f"pts_linears_{i}")(h))
            if i in self.skips:
                h = jnp.concatenate([x, h], axis=-1)

        if not self.use_viewdirs:
            out = self._dense(self.output_ch, "output_linear")(h)
            return out.astype(jnp.float32)

        alpha = self._dense(1, "alpha_linear")(h)

        semantics = None
        if self.use_semantics:
            sem_in = jnp.concatenate([h, x], axis=-1) if self.sem_with_coord else h
            if self.sem_layer <= 2:
                s = nn.relu(self._dense(self.width // 2, "sem_0")(sem_in))
                semantics = self._dense(self.sem_dim, "sem_1")(s)
            else:
                # reference: Linear(W), ReLU, (sem_layer-3) x [Linear(W), ReLU],
                # Linear(W/2), ReLU, Linear(sem_dim)
                s = nn.relu(self._dense(self.width, "sem_0")(sem_in))
                idx = 1
                for _ in range(self.sem_layer - 3):
                    s = nn.relu(self._dense(self.width, f"sem_{idx}")(s))
                    idx += 1
                s = nn.relu(self._dense(self.width // 2, f"sem_{idx}")(s))
                semantics = self._dense(self.sem_dim, f"sem_{idx + 1}")(s)
            if self.sem_with_geo:
                g = nn.relu(self._dense(self.width // 2, "geo_0")(alpha))
                semantics = semantics * self._dense(self.sem_dim, "geo_1")(g)

        feature = self._dense(self.width, "feature_linear")(h)
        hv = jnp.concatenate([feature, views_embed.astype(self.compute_dtype)], axis=-1)
        hv = nn.relu(self._dense(self.width // 2, "views_linears_0")(hv))
        rgb = self._dense(self.output_ch - 1, "rgb_linear")(hv)

        parts = [rgb, alpha]
        if self.use_semantics:
            parts.append(semantics)
        return jnp.concatenate(parts, axis=-1).astype(jnp.float32)


class VolumeInterpolator(nn.Module):
    """Trainable dense voxel grid queried by trilinear interpolation.

    Parity: reference ``models/nerf_mlp.py:272-291`` (``VolumeInterpolater``,
    backed there by ``F.grid_sample(align_corners=True)``). Coordinates are
    in [-1, 1] over (D, H, W); values outside are clamped (border).
    """

    vol_size: Sequence[int]  # (D, H, W, C)

    @nn.compact
    def __call__(self, coords: jnp.ndarray, viewdirs: jnp.ndarray | None = None) -> jnp.ndarray:
        V = self.param("V", nn.initializers.zeros, tuple(self.vol_size), jnp.float32)
        D, H, W, C = V.shape
        # grid_sample convention: coords[..., 0] = x (W), 1 = y (H), 2 = z (D);
        # align_corners=True maps -1 -> 0 and +1 -> size-1.
        sizes = jnp.array([W - 1, H - 1, D - 1], dtype=coords.dtype)
        xyz = (coords + 1.0) / 2.0 * sizes
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]

        def gather(zi, yi, xi):
            zi = jnp.clip(zi, 0, D - 1)
            yi = jnp.clip(yi, 0, H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            return V[zi, yi, xi]

        x0, y0, z0 = jnp.floor(x).astype(jnp.int32), jnp.floor(y).astype(jnp.int32), jnp.floor(z).astype(jnp.int32)
        x1, y1, z1 = x0 + 1, y0 + 1, z0 + 1
        fx, fy, fz = (x - x0)[..., None], (y - y0)[..., None], (z - z0)[..., None]

        c00 = gather(z0, y0, x0) * (1 - fx) + gather(z0, y0, x1) * fx
        c01 = gather(z0, y1, x0) * (1 - fx) + gather(z0, y1, x1) * fx
        c10 = gather(z1, y0, x0) * (1 - fx) + gather(z1, y0, x1) * fx
        c11 = gather(z1, y1, x0) * (1 - fx) + gather(z1, y1, x1) * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        return c0 * (1 - fz) + c1 * fz
