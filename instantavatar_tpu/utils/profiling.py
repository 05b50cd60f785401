"""Tracing / profiling utilities.

The reference's profiling story is vestigial (AdvancedProfiler constructed
but never wired, fit.py:30/40 — SURVEY §5); per-ray sample counters are
its main perf instrument. The TPU framework makes both first-class:

  * ``trace(logdir)``: context manager around ``jax.profiler`` — produces
    a TensorBoard-loadable trace of device execution.
  * ``StepTimer``: host-side rolling step timing with honest readback
    (block_until_ready lies through remote-TPU links — PERF.md), plus
    rays/sec accounting.
  * counter stats (evaluated samples per ray) already flow through
    training losses (``counter_avg``) and RenderOutput.counter, matching
    the reference's val/counter_* logs (DNeRF.py:182-186).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque

import jax
import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str = "profile"):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer with forced host sync.

    Usage:
        timer = StepTimer()
        for batch in ...:
            state, losses = step(...)
            timer.tick(losses["loss"])   # forces readback of the scalar
        print(timer.summary(rays_per_step=4096))
    """

    def __init__(self, window: int = 50):
        self.times: deque[float] = deque(maxlen=window)
        self._last = time.perf_counter()

    def tick(self, sync_value=None) -> float:
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])  # force completion
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        return dt

    @property
    def mean_step_s(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def summary(self, rays_per_step: int | None = None) -> dict:
        out = {"step_ms": self.mean_step_s * 1e3,
               "steps_per_sec": 1.0 / max(self.mean_step_s, 1e-9)}
        if rays_per_step:
            out["rays_per_sec"] = rays_per_step / max(self.mean_step_s,
                                                      1e-9)
        return out
