"""Profiling / tracing aids.

The reference's only instrumentation is a wall-clock avg-sec/step print
(``run_nerf.py:465-468``); the TPU build adds real tracing (SURVEY.md §5):
``jax.profiler`` trace capture around training windows plus a lightweight
step timer that reports rays/sec.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None).

    View with TensorBoard's profile plugin or xprof.
    """
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer: call ``tick(n_rays)`` once per step."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._rays = 0

    def tick(self, n_rays: int) -> None:
        self._steps += 1
        self._rays += n_rays

    def report(self) -> dict:
        """Average sec/step and rays/sec since the last report; resets."""
        dt = time.perf_counter() - self._t0
        out = {
            "sec_per_step": dt / max(self._steps, 1),
            "rays_per_sec": self._rays / max(dt, 1e-9),
            "steps": self._steps,
        }
        self._t0 = time.perf_counter()
        self._steps = 0
        self._rays = 0
        return out
