"""Tracing / profiling utilities (SURVEY.md section 6, tracing row).

The reference had no first-party profiling (Theano flags only). Here:
  * ``trace(logdir)`` — context manager around ``jax.profiler.trace`` for
    XLA/TPU timeline capture (view with tensorboard_plugin_profile).
  * ``annotate(name)`` — named region inside a trace.
  * ``StepTimer`` — honest wall-clock step rates. IMPORTANT platform note
    (benchmarks/NOTES.md): on the tunneled axon TPU, block_until_ready does
    NOT fence execution; StepTimer fences by fetching a caller-provided
    scalar to host.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a profiler trace into ``logdir``; no-op on failure (some
    experimental platforms do not support the profiler)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:  # pragma: no cover - platform dependent
        pass
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:  # pragma: no cover
                pass


def annotate(name: str):
    """Named sub-region for traces: ``with annotate("scoring"): ...``"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/sec with an explicit device fence.

    >>> timer = StepTimer(fence=lambda m: float(m["loss"]))
    >>> for batch in batches:
    ...     state, metrics = step(state, batch)
    ...     rate = timer.tick(metrics)   # None until window fills
    """

    def __init__(self, fence=None, window: int = 50):
        self._fence = fence
        self._window = window
        self._count = 0
        self._t0: Optional[float] = None
        self.last_rate: Optional[float] = None

    def tick(self, fence_arg: Any = None) -> Optional[float]:
        self._count += 1
        if self._count % self._window:
            return None
        if self._fence is not None:
            self._fence(fence_arg)          # host fetch = real fence
        elif fence_arg is not None:
            jax.block_until_ready(fence_arg)
        now = time.perf_counter()
        rate = None
        if self._t0 is not None:
            rate = self._window / (now - self._t0)
            self.last_rate = rate
        self._t0 = now
        return rate
