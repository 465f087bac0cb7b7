"""Profiling and tracing.

The reference's observability is a per-iteration ``time.perf_counter``
print (/root/reference/train.py:209,239-243). Here:

- ``StepTimer``: wall-clock step timing with warmup skip and percentile
  summary (for bench scripts and the trainer);
- ``profile_trace``: context manager around ``jax.profiler.trace`` writing
  a TensorBoard-viewable XPlane trace of device execution;
- ``start_profiler_server``: live profiling endpoint for
  ``tensorboard --logdir`` capture, the standard TPU workflow.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax
import numpy as np


def start_profiler_server(port: int = 9999) -> None:
    jax.profiler.start_server(port)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Records step wall times; reports mean/p50/p90 past a warmup."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def measured(self) -> List[float]:
        return self.times[self.warmup:]

    def summary(self) -> dict:
        m = self.measured or self.times
        if not m:
            return {}
        arr = np.asarray(m)
        return {"mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p90_s": float(np.percentile(arr, 90)),
                "steps": len(m)}
