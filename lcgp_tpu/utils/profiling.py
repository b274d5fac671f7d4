"""Timing + profiling harness (SURVEY §5: the reference has no tracing or
profiling — only wall-clock prints in example scripts).

- ``timed``: accurate device timing via block_until_ready with warmup.
- ``trace``: context manager around jax.profiler for TensorBoard traces.
- ``log_compiles``: context manager that surfaces recompilation events —
  the practical observability tool for shape-stability bugs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 5,
          **kwargs) -> dict:
    """Run fn(*args) with device sync; returns timing stats in seconds."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return dict(median=float(np.median(times)), best=float(np.min(times)),
                mean=float(np.mean(times)), iters=iters)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def log_compiles():
    """Log every XLA compilation inside the block (recompile detector)."""
    with jax.log_compiles():
        yield
