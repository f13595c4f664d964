"""Ray and camera math (device-side, jax.numpy).

TPU-native rewrite of the reference's ray helpers (``utils/ray.py:12-81`` in
VITA-Group/NeRF-SOS): identical math, pure-functional, fixed shapes. Host-side
(numpy) counterparts used by the offline dataset generator live in
``nerfsos_tpu.data.ray_utils``.
"""
from __future__ import annotations

import jax.numpy as jnp


def persp_intrinsics(height: int, width: int, focal: float) -> jnp.ndarray:
    """3x3 pinhole intrinsic matrix, principal point at the image center.

    Parity: reference ``utils/ray.py:48-54`` (``get_persp_intrinsic``).
    """
    return jnp.array(
        [[focal, 0.0, width / 2.0], [0.0, focal, height / 2.0], [0.0, 0.0, 1.0]],
        dtype=jnp.float32,
    )


def persp_rays(height: int, width: int, K: jnp.ndarray, c2w: jnp.ndarray) -> jnp.ndarray:
    """Perspective rays for every pixel.

    Args:
      K:   [3, 3] intrinsics.
      c2w: [3, 4] (or [4, 4]) camera-to-world pose; OpenGL convention
           (camera looks down -z, y up), matching the reference
           ``utils/ray.py:12-22`` (``get_persp_rays``).

    Returns:
      [2, H, W, 3] stacked (origins, directions); directions are NOT normalized
      (the renderer scales distances by ``|d|``, see core/render.py).
    """
    j, i = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)], axis=-1
    )  # [H, W, 3] camera-frame directions
    # Elementwise multiply + sum (VPU, exact fp32) rather than a matmul: a 3x3
    # rotation is too small for the MXU and must not round through bf16.
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return jnp.stack([rays_o, rays_d], axis=0)


def ortho_rays(height: int, width: int, K: jnp.ndarray, c2w: jnp.ndarray, z_dir: float = -1.0) -> jnp.ndarray:
    """Orthographic rays. Parity: reference ``utils/ray.py:33-46``."""
    j, i = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    dirs = jnp.stack([jnp.zeros_like(i), jnp.zeros_like(i), z_dir * jnp.ones_like(i)], axis=-1)
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    origins = jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], jnp.zeros_like(i)], axis=-1
    )
    origins = jnp.sum(origins[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = origins + c2w[:3, -1]
    return jnp.stack([rays_o, rays_d], axis=0)


def ndc_rays(height: int, width: int, focal: float, near: float,
             rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Shift rays to the near plane and project to NDC space.

    Parity: reference ``utils/ray.py:64-81`` (defined there but never called
    from the main path — kept for API completeness; see SURVEY.md §7.4.5).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (width / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (height / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
