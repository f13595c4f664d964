"""Fourier-space volume projector (central-slice theorem).

Parity of capability with the reference ``utils/pytorch_projector.py`` (a
cryo-EM leftover built on torch complex pairs + focustools): project a 3-D
density volume to 2-D along an axis/rotation by multiplying a phase ramp in
Fourier space — here as jittable jnp over native complex dtypes instead of
stacked real/imag channels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fftfreq(n: int) -> jnp.ndarray:
    return jnp.fft.fftfreq(n)


def complex_expi(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.cos(x) + 1j * jnp.sin(x)


def fourier_shift_2d(img_ft: jnp.ndarray, dx: float, dy: float) -> jnp.ndarray:
    """Subpixel shift via a Fourier phase ramp."""
    ny, nx = img_ft.shape
    fy = jnp.fft.fftfreq(ny)[:, None]
    fx = jnp.fft.fftfreq(nx)[None, :]
    return img_ft * complex_expi(-2 * jnp.pi * (fy * dy + fx * dx))


def project_volume(vol: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Real-space line integral along an axis (the trivial projection)."""
    return jnp.sum(vol, axis=axis)


def project_volume_fourier(vol: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Central-slice projection: the zero-frequency slice of the 3-D FT along
    ``axis`` is the 2-D FT of the projection."""
    ft = jnp.fft.fftn(vol)
    sl = [slice(None)] * 3
    sl[axis] = 0
    central = ft[tuple(sl)]
    return jnp.real(jnp.fft.ifftn(central))


def back_project(img: jnp.ndarray, depth: int, axis: int = 0) -> jnp.ndarray:
    """Smear a 2-D image back along an axis (adjoint of project_volume)."""
    expanded = jnp.expand_dims(img, axis)
    reps = [1, 1, 1]
    reps[axis] = depth
    return jnp.tile(expanded, reps) / depth
