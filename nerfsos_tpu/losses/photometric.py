"""Photometric losses and PSNR. Parity: reference ``utils/image.py:125-137``."""
from __future__ import annotations

import jax.numpy as jnp


def img2mse(x: jnp.ndarray, y: jnp.ndarray, reduction: str = "mean") -> jnp.ndarray:
    """Channel-mean squared error, then reduced over pixels."""
    diff = jnp.mean((x - y) ** 2, axis=-1)
    if reduction == "mean":
        return jnp.mean(diff)
    if reduction == "sum":
        return jnp.sum(diff)
    return diff


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
