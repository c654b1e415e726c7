"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has only
an ad-hoc ``time.time()`` probe, ``test_mosi.py:335-342``).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory.
- :class:`Throughput` — steps/sec + epoch-time counter with honest
  host materialization (``block_until_ready`` under-reports through
  remote-tunnel devices).
- :func:`time_fn` — median-of-k timer for compiled functions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _materialize(out):
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[0])
    return out


class Throughput:
    """Accumulates step/epoch timings; reports steps/sec."""

    def __init__(self):
        self.steps = 0
        self.seconds = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, steps: int, materialize=None):
        if materialize is not None:
            _materialize(materialize)
        self.seconds += time.perf_counter() - self._t0
        self.steps += steps

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.seconds if self.seconds else 0.0


def time_fn(fn: Callable, *args, reps: int = 5, warmup: int = 1) -> float:
    """Median seconds per call, forcing host materialization."""
    for _ in range(warmup):
        _materialize(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _materialize(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
