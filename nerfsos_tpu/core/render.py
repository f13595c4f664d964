"""Volumetric compositing (quadrature rule), classic and mip variants.

TPU-native rewrite of the reference renderers (``models/renderer.py:9-152`` in
VITA-Group/NeRF-SOS): identical math — including the 1e10 far-padding, the
``|rays_d|`` distance scaling (ray directions are unnormalized), the
``+1e-10`` inside the exclusive transmittance cumprod, the vacancy-depth
override, and white-background compositing applied to BOTH rgb and semantic
maps — expressed with ``jnp.where`` instead of in-place masking.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from nerfsos_tpu.core.scan_ops import cumprod_last


def exclusive_cumprod_1m(alpha: jnp.ndarray) -> jnp.ndarray:
    """Transmittance T_i = prod_{j<i} (1 - alpha_j + 1e-10) (exclusive).

    Parity: reference ``models/renderer.py:57-58``.
    """
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10], axis=-1
    )
    # TPU: jnp.cumprod lowers to a while loop (~ms at [65536,192]); the
    # doubling scan in scan_ops is loop-free (CPU keeps jnp.cumprod).
    return cumprod_last(shifted)


def sigma_to_weights(
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Quadrature weights from raw densities alone (no color compositing).

    Exactly the weights math of ``volumetric_render`` (reference
    ``models/renderer.py:48-59``), split out so a sigma-only coarse pass can
    drive importance sampling without computing the color/semantic heads
    (the fused Pallas field is opaque to XLA dead-code elimination, so the
    skip must happen at the call site).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    if raw_noise_std > 0.0:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    return alpha * exclusive_cumprod_1m(alpha)


def volumetric_render(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    use_semantics: bool = False,
    noise_key: Optional[jax.Array] = None,
    channels_first: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Composite per-sample raw network outputs into per-ray maps.

    Args:
      raw:    [R, S, C] with channels [rgb(3), sigma(1), semantics(sem_dim)] —
              or [C, R, S] with ``channels_first=True`` (the planar fused
              field's native layout; identical math, same RNG draw shape).
      z_vals: [R, S] sample depths along each ray.
      rays_d: [R, 3] UNNORMALIZED ray directions.
    Returns:
      dict(rgb [R,3], disp [R,1], acc [R,1], weights [R,S], depth [R,1],
           semantics [R,sem_dim] when use_semantics).
    Parity: reference ``models/renderer.py:21-85`` (``VolumetricRenderer``).
    """
    sigma = raw[3] if channels_first else raw[..., 3]
    weights = sigma_to_weights(
        sigma, z_vals, rays_d,
        raw_noise_std=raw_noise_std, noise_key=noise_key,
    )

    if channels_first:
        rgb = jax.nn.sigmoid(raw[0:3])  # [3, R, S]
        rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T
    else:
        rgb = jax.nn.sigmoid(raw[..., :3])
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1, keepdims=True)
    acc_map = jnp.sum(weights, axis=-1, keepdims=True)
    depth_map = jnp.where(acc_map <= 1e-10, 1e10, depth_map)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    out = dict(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights, depth=depth_map)
    if use_semantics:
        if channels_first:
            sem_map = jnp.sum(weights[None] * raw[4:], axis=-1).T
        else:
            sem_map = jnp.sum(weights[..., None] * raw[..., 4:], axis=-2)
        if white_bkgd:
            sem_map = sem_map + (1.0 - acc_map)
        out["semantics"] = sem_map
    if white_bkgd:
        out["rgb"] = rgb_map + (1.0 - acc_map)
    return out


def mip_volumetric_render(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    noise_key: Optional[jax.Array] = None,
    channels_first: bool = False,
) -> Dict[str, jnp.ndarray]:
    """mip-NeRF compositing over interval Gaussians.

    Args:
      raw:    [R, S, 4] with sigma LAST (``raw[..., -1]``), per the reference
              — or [4, R, S] with ``channels_first=True`` (planar fused field).
      z_vals: [R, S+1] interval EDGES (samples live between consecutive edges).
    Parity: reference ``models/renderer.py:98-152`` (``MipVolumetricRenderer``)
    — midpoint depths, no far-padding of dists.
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    sigma = raw[-1] if channels_first else raw[..., -1]
    if raw_noise_std > 0.0:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape, sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    weights = alpha * exclusive_cumprod_1m(alpha)

    if channels_first:
        rgb = jax.nn.sigmoid(raw[:-1])  # [3, R, S]
        rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T
    else:
        rgb = jax.nn.sigmoid(raw[..., :-1])
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * mids, axis=-1, keepdims=True)
    acc_map = jnp.sum(weights, axis=-1, keepdims=True)
    depth_map = jnp.where(acc_map <= 1e-10, 1e10, depth_map)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)

    out = dict(rgb=rgb_map, disp=disp_map, acc=acc_map, weights=weights, depth=depth_map)
    if white_bkgd:
        out["rgb"] = rgb_map + (1.0 - acc_map)
    return out


def projection_render(raw: jnp.ndarray, pts: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Straight integration ``∫ V(o + td) dt`` (no occlusion model).

    Parity: reference ``models/renderer.py:164-186`` (``ProjectionRenderer``,
    unused in the main path but part of the component inventory).
    """
    dists = jnp.linalg.norm(pts[..., 1:, :] - pts[..., :-1, :], axis=-1)
    values = (raw[..., :-1, :] + raw[..., 1:, :]) / 2.0
    rgb_map = jnp.sum(values * dists[..., None], axis=-2)

    weights = jnp.mean(raw, axis=-1)
    dists_pad = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
    weights = 1.0 - jnp.exp(-jax.nn.relu(weights) * dists_pad)
    return dict(rgb=rgb_map, weights=weights)
