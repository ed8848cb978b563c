"""Profiling & timing utilities.

The reference's only instrumentation is wall-clock time around each run
(``src/train.py:459,498-499``). Here (SURVEY.md §5.1): honest per-step
timing with ``block_until_ready`` fencing, plus ``jax.profiler`` trace
capture for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def _fence(out) -> None:
    """Device fence: block_until_ready is not reliable through tunneled
    PJRT plugins (axon); force a device->host transfer of one element of
    every output leaf instead."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(jax.device_get(leaf.ravel()[0]))


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2):
    """Median/min/mean seconds per call, device-fenced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {
        "median_s": float(np.median(t)),
        "min_s": float(t.min()),
        "mean_s": float(t.mean()),
        "iters": iters,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/allset_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield log_dir


class StepTimer:
    """Lightweight running stats for host-side loops (HAN trainer etc.)."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self):
        t = np.asarray(self.times) if self.times else np.zeros(1)
        return {"mean_s": float(t.mean()), "std_s": float(t.std()), "n": len(self.times)}
