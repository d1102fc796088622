"""Profiling & tracing.

The reference has wall-clock timers only (SURVEY.md §5.1). Here:
  * :class:`StepTimer` — steady-state step timing with device sync;
  * :func:`trace` — context manager around jax.profiler (perfetto/tensorboard
    trace of the XLA timeline, the real TPU tracing story);
  * :func:`device_memory_stats` — per-device HBM usage snapshot.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Wall-clock step timer that ignores the first (compile) steps."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.count = -skip_first
        self.total = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > 0:
            self.total += dt

    @property
    def mean_s(self) -> float:
        return self.total / max(self.count, 1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA device trace viewable in tensorboard/perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict]:
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
