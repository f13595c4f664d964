"""Numerical guards & debugging aids.

TPU equivalents of the reference's nan/inf printers (``utils/error.py:7-28``)
and its globally-enabled ``torch.autograd.set_detect_anomaly`` (``run_nerf.py:540``):

- ``check``/``check_zero``/``check_all_zero`` work on host values or inside
  jit via ``jax.debug.print`` (non-blocking),
- ``enable_nan_debugging()`` flips ``jax_debug_nans`` — the compiled-graph
  analog of anomaly detection (re-runs the offending primitive un-jitted and
  raises at the source op).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def check(**tensors) -> None:
    """Print a diagnostic for any nan/inf entries (works under jit)."""
    for name, t in tensors.items():
        t = jnp.asarray(t)
        bad = jnp.logical_or(jnp.any(jnp.isnan(t)), jnp.any(jnp.isinf(t)))
        jax.debug.print(
            "! [Numerical] {name}: nan/inf={bad}", name=name, bad=bad, ordered=False
        )


def check_zero(**tensors) -> None:
    for name, t in tensors.items():
        t = jnp.asarray(t)
        jax.debug.print(
            "! [Numerical] {name}: any_zero={z}", name=name,
            z=jnp.any(t == 0), ordered=False,
        )


def check_all_zero(**tensors) -> None:
    for name, t in tensors.items():
        t = jnp.asarray(t)
        jax.debug.print(
            "! [Numerical] {name}: all_zero={z}", name=name,
            z=jnp.all(t == 0), ordered=False,
        )


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side hard check (post-device-sync); use in tests and eval loops."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(f"{name}{jax.tree_util.keystr(path)} has nan/inf")
