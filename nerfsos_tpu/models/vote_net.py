"""Pose voting over a polar grid by rendering likelihood.

TPU-native rewrite of the reference ``VoteNet`` (``models/vote_net.py:32-123``
in VITA-Group/NeRF-SOS; unused in its main path but part of the component
inventory): candidate (rotation, translation) pairs on an azimuth/zenith grid
score each ray bundle by negative render error, softmax over candidates, sum
over rays, and the expected polar angles come from the normalized vote map.

The torch chunk loop becomes vectorized batching over candidate poses; the
matplotlib heatmap dump is returned to the caller instead of a hardcoded path.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def polar_to_rotmat(azimuths: jnp.ndarray, zeniths: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt camera frame looking at the origin from polar coords."""
    view_dir = -jnp.stack(
        [jnp.sin(zeniths) * jnp.cos(azimuths), jnp.cos(zeniths),
         jnp.sin(zeniths) * jnp.sin(azimuths)], -1)
    up_dir = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), view_dir.shape)
    left_dir = jnp.cross(up_dir, view_dir)
    left_dir = left_dir / jnp.linalg.norm(left_dir, axis=-1, keepdims=True)
    up_dir = jnp.cross(view_dir, left_dir)
    return jnp.stack([left_dir, up_dir, view_dir], -1)


def polar_to_xyz(azimuths: jnp.ndarray, zeniths: jnp.ndarray, rad: float = 1.0) -> jnp.ndarray:
    return jnp.stack(
        [rad * jnp.sin(zeniths) * jnp.cos(azimuths), rad * jnp.cos(zeniths),
         rad * jnp.sin(zeniths) * jnp.sin(azimuths)], -1)


class VoteNet:
    """Holds a NeRF renderer + scene bounds; voting methods are pure."""

    def __init__(self, nerf, bounds: Tuple[float, float],
                 a_samples: int = 64, z_samples: int = 64):
        self.nerf = nerf
        self.bounds = bounds
        self.a_samples = a_samples
        self.z_samples = z_samples

    def vote_rays(self, params: Any, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  gts: jnp.ndarray, rots: jnp.ndarray, ts: jnp.ndarray) -> jnp.ndarray:
        """Score candidate poses per ray (softmax over candidates), sum over rays.

        Args: rays_o/rays_d/gts [N_imgs, N_rays, 3]; rots [A, Z, 3, 3]; ts [A, Z, 3].
        Returns: votes [N_imgs, A*Z, 1].
        """
        o = jnp.einsum("azij,nrj->nrazi", rots, rays_o) + ts
        d = jnp.einsum("azij,nrj->nrazi", rots, rays_d)
        ray_batch = jnp.stack([o, d], 0)  # [2, N, R, A, Z, 3]
        out = self.nerf(params, ray_batch, self.bounds)
        err = jnp.linalg.norm(out["rgb"] - gts[:, :, None, None, :], axis=-1, keepdims=True)
        votes = -err.reshape(err.shape[0], err.shape[1], -1, 1)
        votes = jax.nn.softmax(votes, axis=2)
        return jnp.sum(votes, axis=1)

    def __call__(self, params: Any, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 gts: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Returns dict(expected [N_imgs, 2] polar angles, heatmap [A, Z])."""
        az, ze = jnp.meshgrid(
            jnp.linspace(-math.pi, math.pi, self.a_samples),
            jnp.linspace(-math.pi, math.pi, self.z_samples),
            indexing="ij",
        )
        ts = polar_to_xyz(az, ze)
        rots = polar_to_rotmat(az, ze)

        votes = self.vote_rays(params, rays_o, rays_d, gts, rots, ts)
        votes = jax.nn.softmax(votes, axis=1)  # [N, A*Z, 1]

        grids = jnp.stack([az, ze], -1).reshape(-1, 2)
        expected = jnp.sum(votes * grids, axis=1)
        heatmap = votes[0].reshape(self.a_samples, self.z_samples)
        return {"expected": expected, "heatmap": heatmap}
