"""Voxel-backed NeRF: the NeRFNet pipeline with a dense trainable grid field.

Parity: reference ``VoxelNeRFNet`` (``models/voxel_nerf_net.py:20-39``; not
reachable from its CLI but part of the component inventory): same sampling +
compositing as NeRFNet with a ``VolumeInterpolater`` backbone shared between
coarse and fine passes.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax

from nerfsos_tpu.models.fields import VoxelField
from nerfsos_tpu.models.nerf import NeRFConfig, NeRFNet


class VoxelNeRFNet(NeRFNet):
    """NeRFNet whose field is a trilinear voxel grid (no PE, no viewdirs)."""

    def __init__(self, cfg: NeRFConfig, vol_size: Sequence[int] = (128, 128, 128, 4)):
        cfg = NeRFConfig(**{**vars(cfg), "use_viewdirs": False, "fused_field": False})
        super().__init__(cfg)
        self.voxel = VoxelField(vol_size=tuple(vol_size))

    def init(self, key: jax.Array) -> Dict[str, Any]:
        import jax.numpy as jnp

        return {"voxel": self.voxel.init(key, jnp.zeros((2, 3, 3)))["params"]}

    def _apply(self, params: Dict[str, Any], which: str, pts, viewdirs):
        # one grid serves both coarse and fine passes (reference :49-54 analog)
        return self.voxel.apply({"params": params["voxel"]}, pts)
