"""Positional encodings (classic NeRF PE and mip-NeRF integrated PE).

TPU-native rewrite of the reference encoders (``models/embedder.py:11-98`` in
VITA-Group/NeRF-SOS). The feature ORDER is bit-compatible with the reference —
``[x, sin(f0·x), cos(f0·x), sin(f1·x), ...]`` with per-frequency blocks laid
out ``[sin(f·x), sin(f·y), sin(f·z), cos(f·x), cos(f·y), cos(f·z)]`` — so the
first Dense layer of a converted torch checkpoint consumes identical columns.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def freq_bands(n_freqs: int, max_freq: float, log_sampling: bool = True) -> jnp.ndarray:
    """``2^linspace(0, max_freq, n)`` (log) or ``linspace(2^0, 2^max_freq, n)``.

    Parity: reference ``models/embedder.py:25-28``.
    """
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, max_freq, n_freqs)
    return jnp.linspace(2.0**0.0, 2.0**max_freq, n_freqs)


def pe_dim(input_dim: int, n_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * n_freqs + (1 if include_input else 0))


def positional_encoding(
    x: jnp.ndarray,
    n_freqs: int,
    max_freq: float | None = None,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Classic NeRF positional encoding.

    Args:
      x: [..., D] coordinates.
    Returns:
      [..., pe_dim(D, n_freqs)] with reference-compatible column order
      (``models/embedder.py:34-48``): per frequency, sin over channels then
      cos over channels; raw input (if any) prepended.
    """
    if n_freqs == 0:
        return x
    if max_freq is None:
        max_freq = float(n_freqs - 1)
    bands = freq_bands(n_freqs, max_freq, log_sampling).astype(x.dtype)
    xf = x[..., None, :] * bands[:, None]  # [..., F, D]
    emb = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # [..., F, 2D]
    emb = emb.reshape(*x.shape[:-1], -1)  # freq-major, (sin,cos)-then-channel
    if include_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return emb


def _trig_matmul_consts(input_dim: int, n_freqs: int, max_freq: float,
                        log_sampling: bool):
    """(M [D, 2*D*F], phase [2*D*F]) such that
    sin(x @ M + phase) == positional_encoding(x)[..., D:] column-for-column
    (cos realized as sin(t + pi/2))."""
    import numpy as np

    if log_sampling:
        bands = (2.0 ** np.linspace(0.0, max_freq, n_freqs)).astype(np.float32)
    else:
        bands = np.linspace(2.0**0.0, 2.0**max_freq, n_freqs).astype(np.float32)
    cols = 2 * input_dim * n_freqs
    M = np.zeros((input_dim, cols), np.float32)
    phase = np.zeros((cols,), np.float32)
    k = 0
    for f in bands:
        for fn_phase in (0.0, math.pi / 2):  # sin block then cos block
            for c in range(input_dim):
                M[c, k] = f
                phase[k] = fn_phase
                k += 1
    return M, phase


def positional_encoding_fused(
    x: jnp.ndarray,
    n_freqs: int,
    max_freq: float | None = None,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """``positional_encoding`` as ONE matmul + ONE sin.

    Column-order identical to :func:`positional_encoding`; values agree to
    float ulp (cos(t) computed as sin(t + pi/2)). The naive form emits ~2F
    tiny [..., D]-lane trig ops plus a 2F-way concatenate — poorly shaped for
    the TPU VPU; this form is a [D, 2DF] matmul and a single well-tiled sin.
    """
    if n_freqs == 0:
        return x
    if max_freq is None:
        max_freq = float(n_freqs - 1)
    M, phase = _trig_matmul_consts(x.shape[-1], n_freqs, max_freq, log_sampling)
    # precision=HIGHEST is load-bearing: TPU matmuls default to bf16-rounded
    # inputs, and with frequencies up to 2^max_freq the resulting PHASE error
    # is ~|x|*2^max_freq*2^-8 — radians — which turns sin into a different
    # (deformed) encoding. HIGHEST keeps the phase accurate to fp32.
    import jax

    emb = jnp.sin(
        jnp.dot(x, jnp.asarray(M, x.dtype), precision=jax.lax.Precision.HIGHEST)
        + jnp.asarray(phase, x.dtype)
    )
    if include_input:
        emb = jnp.concatenate([x, emb], axis=-1)
    return emb


def ipe_dim(input_dim: int, n_freqs: int) -> int:
    return 2 * input_dim * n_freqs


def expected_sin(x: jnp.ndarray, x_var: jnp.ndarray) -> jnp.ndarray:
    """E[sin(z)] for z ~ N(x, x_var). Parity: ``models/embedder.py:67-75``."""
    return jnp.exp(-0.5 * x_var) * jnp.sin(x)


def integrated_positional_encoding(
    x: jnp.ndarray,
    x_cov_diag: jnp.ndarray,
    n_freqs: int,
    max_freq: float | None = None,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """mip-NeRF integrated positional encoding over diagonal Gaussians.

    Args:
      x:          [..., D] Gaussian means.
      x_cov_diag: [..., D] diagonal covariances.
    Returns:
      [..., 2*D*n_freqs]; parity: reference ``models/embedder.py:77-98``
      (``sin`` block then the ``sin(x + pi/2) = cos`` block).
    """
    if max_freq is None:
        max_freq = float(n_freqs - 1)
    bands = freq_bands(n_freqs, max_freq, log_sampling).astype(x.dtype)
    y = (x[..., None, :] * bands[:, None]).reshape(*x.shape[:-1], -1)
    y_var = (x_cov_diag[..., None, :] * (bands[:, None] ** 2)).reshape(*x.shape[:-1], -1)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * math.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1),
    )
