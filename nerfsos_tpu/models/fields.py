"""Radiance fields: positional encoding + MLP, queried point-wise.

TPU-native rewrite of the reference field wrappers
(``models/nerf_mlp.py:132-270`` in VITA-Group/NeRF-SOS). The reference's
``netchunk`` Python loop is deleted: fields are applied to whole fixed-shape
sample tensors; memory is bounded upstream by the rematerialized ray-block
scan in ``models/nerf.py``.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from nerfsos_tpu.core import encoding
from nerfsos_tpu.models.mlp import NeRFMLP, VolumeInterpolator

Dtype = Any


class NeRFField(nn.Module):
    """Classic NeRF field: PE(pts) [+ PE(dirs)] -> NeRFMLP -> raw channels.

    Parity: reference ``NeRFMLP`` (``models/nerf_mlp.py:132-215``) including
    the optional Conv1d smoothing over the sample axis (``conv_embed``,
    reference ``:156-162, 195-207``).
    """

    net_depth: int = 8
    net_width: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    use_embed: bool = True
    multires: int = 10
    multires_views: int = 4
    conv_embed: bool = False
    output_ch: int = 4
    use_semantics: bool = False
    sem_layer: int = 2
    sem_dim: int = 2
    sem_with_coord: bool = False
    sem_with_geo: bool = False
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts: jnp.ndarray, viewdirs: jnp.ndarray | None) -> jnp.ndarray:
        """Args:
          pts:      [..., S, 3] sample positions.
          viewdirs: [..., 3] unit view directions (broadcast over S) or None.
        Returns:
          raw: [..., S, output_ch(+sem_dim)] float32.
        """
        if self.use_embed:
            emb = encoding.positional_encoding_fused(pts, self.multires, float(self.multires - 1))
        else:
            emb = pts

        if self.conv_embed:
            # Conv over the sample axis, kernel 3, same padding (reference
            # ``models/nerf_mlp.py:160, 195-199``). flax Conv is NLC.
            c = emb.shape[-1]
            flat = emb.reshape(-1, emb.shape[-2], c)
            flat = nn.Conv(c, kernel_size=(3,), padding="SAME", name="conv_embed",
                           dtype=self.compute_dtype, param_dtype=jnp.float32)(flat)
            emb = flat.reshape(emb.shape).astype(jnp.float32)

        demb = None
        if self.use_viewdirs:
            d = jnp.broadcast_to(viewdirs[..., None, :], pts.shape)
            demb = (
                encoding.positional_encoding_fused(d, self.multires_views, float(self.multires_views - 1))
                if self.use_embed
                else d
            )
            if self.conv_embed:
                c = demb.shape[-1]
                flat = demb.reshape(-1, demb.shape[-2], c)
                flat = nn.Conv(c, kernel_size=(3,), padding="SAME", name="conv_embeddirs",
                               dtype=self.compute_dtype, param_dtype=jnp.float32)(flat)
                demb = flat.reshape(demb.shape).astype(jnp.float32)

        mlp = NeRFMLP(
            depth=self.net_depth,
            width=self.net_width,
            skips=self.skips,
            use_viewdirs=self.use_viewdirs,
            output_ch=self.output_ch,
            use_semantics=self.use_semantics,
            sem_layer=self.sem_layer,
            sem_dim=self.sem_dim,
            sem_with_coord=self.sem_with_coord,
            sem_with_geo=self.sem_with_geo,
            compute_dtype=self.compute_dtype,
            name="mlp",
        )
        # Flatten [..., S, C] -> [M, C] so every Dense lowers to a clean 2-D
        # matmul: 3-D dot_generals over the sample axis force padded layout
        # copies on TPU (observed 2-42x HBM expansion in XLA memory dumps).
        lead = emb.shape[:-1]
        out = mlp(
            emb.reshape(-1, emb.shape[-1]),
            demb.reshape(-1, demb.shape[-1]) if demb is not None else None,
        )
        return out.reshape(*lead, out.shape[-1])


class MipNeRFField(nn.Module):
    """mip-NeRF field: IPE(mean, cov) + PE(dirs) -> NeRFMLP.

    Parity: reference ``MipNeRFMLP`` (``models/nerf_mlp.py:218-270``).
    """

    net_depth: int = 8
    net_width: int = 256
    skips: Sequence[int] = (4,)
    use_viewdirs: bool = True
    use_embed: bool = True
    multires: int = 10
    multires_views: int = 4
    output_ch: int = 4
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pts_mean: jnp.ndarray, pts_cov: jnp.ndarray,
                 viewdirs: jnp.ndarray | None) -> jnp.ndarray:
        if self.use_embed:
            emb = encoding.integrated_positional_encoding(
                pts_mean, pts_cov, self.multires, float(self.multires - 1)
            )
        else:
            emb = pts_mean
        demb = None
        if self.use_viewdirs:
            d = jnp.broadcast_to(viewdirs[..., None, :], pts_mean.shape)
            demb = (
                encoding.positional_encoding(d, self.multires_views, float(self.multires_views - 1))
                if self.use_embed
                else d
            )
        mlp = NeRFMLP(
            depth=self.net_depth,
            width=self.net_width,
            skips=self.skips,
            use_viewdirs=self.use_viewdirs,
            output_ch=self.output_ch,
            compute_dtype=self.compute_dtype,
            name="mlp",
        )
        lead = emb.shape[:-1]
        out = mlp(
            emb.reshape(-1, emb.shape[-1]),
            demb.reshape(-1, demb.shape[-1]) if demb is not None else None,
        )
        return out.reshape(*lead, out.shape[-1])


class VoxelField(nn.Module):
    """Dense trainable voxel grid field (reference ``models/voxel_nerf_net.py:20-39``)."""

    vol_size: Sequence[int] = (128, 128, 128, 4)

    @nn.compact
    def __call__(self, pts: jnp.ndarray, viewdirs: jnp.ndarray | None = None) -> jnp.ndarray:
        return VolumeInterpolator(self.vol_size, name="volume")(pts)
