"""Windowed SSIM (gaussian 11x11, sigma 1.5) with reference parity.

Parity: reference ``utils/ssim.py:8-38`` — zero-padded depthwise gaussian
convs, C1=0.01^2, C2=0.03^2, mean over the full (padded-edge-included) map.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = jnp.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    )
    g = g / g.sum()
    return jnp.outer(g, g)  # [ws, ws]


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """x: [N, C, H, W]; zero-padded SAME depthwise conv with the window."""
    C = x.shape[1]
    ws = window.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (C, 1, ws, ws))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=[(ws // 2, ws // 2), (ws // 2, ws // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         size_average: bool = True, data_format: str = "NCHW") -> jnp.ndarray:
    """SSIM between two image batches in [0, 1].

    ``data_format``: 'NCHW' | 'NHWC' | 'HWC' (single image).
    """
    if data_format == "HWC":
        img1 = img1.transpose(2, 0, 1)[None]
        img2 = img2.transpose(2, 0, 1)[None]
    elif data_format == "NHWC":
        img1 = img1.transpose(0, 3, 1, 2)
        img2 = img2.transpose(0, 3, 1, 2)

    window = gaussian_window(window_size).astype(img1.dtype)
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2

    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
