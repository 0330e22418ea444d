"""Tracing / profiling helpers (SURVEY.md §5: the reference only prints
``time.time()`` deltas every 100 iterations, engine.py:163,187-191).

- :func:`trace_steps` wraps a window of training steps in a
  ``jax.profiler`` trace whose artifacts (Perfetto/XPlane) land in the run
  directory;
- :class:`StepTimer` measures per-step host wall time with device sync at
  window boundaries only, so timing never forces extra per-step syncs.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_steps(log_dir: str):
    """Profile everything inside the context into ``log_dir``.

    View with TensorBoard's profile plugin or Perfetto (the trace includes
    XLA HLO + TPU hardware counters on real hardware).
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Windowed steps/sec: sync the device once per window, not per step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._count = 0
        self._t0: float | None = None
        self.steps_per_sec = 0.0

    def tick(self, sync_value=None) -> bool:
        """Call once per step; returns True when a window just closed.

        ``sync_value``: any device array from this step; blocked on at window
        edges so the measurement covers real device time.
        """
        if self._t0 is None:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self._t0 = time.perf_counter()
            self._count = 0
            return False
        self._count += 1
        if self._count >= self.window:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            dt = time.perf_counter() - self._t0
            self.steps_per_sec = self._count / dt
            self._t0 = time.perf_counter()
            self._count = 0
            return True
        return False
