"""Learnable per-camera pose correction + pose corruption utilities.

TPU-native rewrite of the reference camera module (``models/camera.py`` in
VITA-Group/NeRF-SOS; unused in its main path but part of the component
inventory): per-camera quaternion + translation applied to rays, plus helpers
to synthetically corrupt poses (for pose-refinement experiments) and rotate
ray bundles by Euler angles.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def corrupt_cameras(cam_poses: np.ndarray, rng: np.random.Generator,
                    offset: Tuple[float, float] = (-0.1, 0.1),
                    rotation: Tuple[float, float] = (-5, 5)) -> np.ndarray:
    """Randomly perturb [N, 3, 4] poses (host-side numpy).

    Parity: reference ``models/camera.py:6-40`` (Rz then Ry then Rx applied).
    """
    n = cam_poses.shape[0]
    rand_t = rng.random((n, 3))
    tr = cam_poses[:, :3, 3] + (1 - rand_t) * offset[0] + rand_t * offset[1]

    rand = rng.random((n, 3))
    rand_r = np.deg2rad((1 - rand) * rotation[0] + rand * rotation[1])

    rot = cam_poses[:, :3, :3]
    for R in [_euler_mats_np(rand_r, 2), _euler_mats_np(rand_r, 1), _euler_mats_np(rand_r, 0)]:
        rot = R @ rot
    return np.concatenate([rot, tr[..., None]], axis=-1)


def _euler_mats_np(angles: np.ndarray, axis: int) -> np.ndarray:
    c, s = np.cos(angles[:, axis]), np.sin(angles[:, axis])
    one, zero = np.ones_like(c), np.zeros_like(c)
    if axis == 0:
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == 1:
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return np.stack(rows, axis=1).reshape(-1, 3, 3)


def _euler_mats(angles: jnp.ndarray, axis: int) -> jnp.ndarray:
    c, s = jnp.cos(angles[:, axis]), jnp.sin(angles[:, axis])
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 0:
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == 1:
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=1).reshape(-1, 3, 3)


def transform_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray, cam_id: jnp.ndarray,
                   rotation: jnp.ndarray, offset: jnp.ndarray):
    """Apply per-camera Euler rotation + translation to rays.

    Parity: reference ``models/camera.py:42-77``.
    """
    euler = rotation[cam_id]
    rays_o = rays_o + offset[cam_id]
    d = rays_d[..., None]
    for R in [_euler_mats(euler, 2), _euler_mats(euler, 1), _euler_mats(euler, 0)]:
        d = R @ d
    return rays_o, d[..., 0]


def quat_to_rotmats(rvec: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] (x, y, z, w) quaternions -> [N, 3, 3] rotations, with the
    reference's 1e-5-regularized normalization (``models/camera.py:103-118``)."""
    theta = jnp.sqrt(1e-5 + jnp.sum(rvec**2, axis=1))
    q = rvec / theta[:, None]
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            1 - 2 * y**2 - 2 * z**2, 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * x**2 - 2 * z**2, 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (x * w + y * z), 1 - 2 * x**2 - 2 * y**2,
        ],
        axis=1,
    ).reshape(-1, 3, 3)


class CameraTransformer(nn.Module):
    """Trainable per-camera ray correction (identity-initialized).

    Parity: reference ``models/camera.py:81-143``; the non-trainable variant
    is just ``jax.lax.stop_gradient`` around the outputs.
    """

    num_cams: int
    trainable: bool = True

    @nn.compact
    def __call__(self, rays_o: jnp.ndarray, rays_d: jnp.ndarray):
        """Args: rays_o/rays_d [N, 4] with the camera id in channel 3."""
        rvec = self.param(
            "rvec",
            lambda key, shape: jnp.tile(jnp.array([0.0, 0, 0, 1]), (self.num_cams, 1)),
            (self.num_cams, 4),
        )
        tvec = self.param("tvec", nn.initializers.zeros, (self.num_cams, 3))
        if not self.trainable:
            import jax

            rvec = jax.lax.stop_gradient(rvec)
            tvec = jax.lax.stop_gradient(tvec)

        idx = rays_o[..., 3].astype(jnp.int32)
        c2w = quat_to_rotmats(rvec)[idx]
        new_d = jnp.sum(rays_d[..., None, :3] * c2w, axis=-1)
        new_o = rays_o[..., :3] + tvec[idx]
        return new_o, new_d
