"""Cumulative ops tuned for TPU.

``jnp.cumsum``/``jnp.cumprod`` lower to ``while`` loops on this TPU
toolchain — a profiler trace of the flagship eval render shows ~16 ms/step
of while-loop time, almost all of it the transmittance cumprod and the
inverse-CDF cumsum. The Hillis-Steele doubling scan below is log2(S) UNROLLED
elementwise steps (shift + combine), which XLA fuses into a handful of
vectorized kernels with no loop carry.

On CPU (tests, goldens) the jnp originals are kept: the doubling scan's
tree-order rounding differs from the sequential scan at the ~1e-7 level, and
the torch-oracle goldens assume sequential order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _doubling_scan(x: jnp.ndarray, combine, pad_value: float) -> jnp.ndarray:
    """Inclusive scan along the LAST axis via Hillis-Steele doubling."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.full_like(x[..., :k], pad_value), x[..., :-k]], axis=-1)
        x = combine(x, shifted)
        k *= 2
    return x


def cumsum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along the last axis (TPU: doubling scan)."""
    if jax.default_backend() == "tpu":
        return _doubling_scan(x, jnp.add, 0.0)
    return jnp.cumsum(x, axis=-1)


def cumprod_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumprod along the last axis (TPU: doubling scan)."""
    if jax.default_backend() == "tpu":
        return _doubling_scan(x, jnp.multiply, 1.0)
    return jnp.cumprod(x, axis=-1)
