"""Profiling / tracing utilities.

The reference has no profiling beyond tqdm postfix (SURVEY §5).  The
TPU-native build provides:

* :class:`StepTimer` -- wall-clock step timing with warmup discard and
  img/s summary (host-sync'd correctly for async backends).
* :func:`trace` -- context manager around ``jax.profiler`` writing an
  XPlane trace viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import numpy as np

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Records per-step wall times; call ``stop`` AFTER a host sync (e.g.
    ``float(loss)``) so async dispatch doesn't under-report."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() without start()")
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    @property
    def measured(self) -> np.ndarray:
        return np.asarray(self.times[self.warmup:])

    def mean_step_seconds(self) -> float:
        m = self.measured
        return float(m.mean()) if m.size else float("nan")

    def images_per_second(self, batch_size: int) -> float:
        return batch_size / self.mean_step_seconds()

    def summary(self, batch_size: Optional[int] = None) -> dict:
        m = self.measured
        out = {
            "steps": int(m.size),
            "mean_s": float(m.mean()) if m.size else None,
            "p50_s": float(np.percentile(m, 50)) if m.size else None,
            "p95_s": float(np.percentile(m, 95)) if m.size else None,
        }
        if batch_size is not None and m.size:
            out["img_per_s"] = batch_size / float(m.mean())
        return out


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``with trace("/tmp/t"):`` -- wraps jax.profiler.trace; the result
    opens in TensorBoard's profile plugin."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
