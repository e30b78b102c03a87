"""Profiling / tracing utilities.

TPU-native equivalents of the reference's instrumentation:
  * d2 TorchProfiler hook (engine/hooks.py:376-500) -> ``trace`` context
    manager emitting a TensorBoard-viewable XLA trace via jax.profiler.
  * semseg ``@timer`` decorator and ``throughput`` helper
    (semseg/utils/utils.py:89-119).
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Iterable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "output/profile"):
    """Capture an XLA/TPU profile; view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timer(fn: Callable) -> Callable:
    """Wall-clock decorator that blocks on JAX outputs (so timings are
    real device time, not dispatch time)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        wrapped.last_ms = (time.perf_counter() - t0) * 1000.0
        return out

    wrapped.last_ms = float("nan")
    return wrapped


def throughput(fn: Callable, args: tuple, iters: int = 10, warmup: int = 2,
               batch: int = 1) -> dict:
    """items/sec of a jitted callable (reference throughput())."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return {
        "items_per_sec": iters * batch / dt,
        "latency_ms": 1000.0 * dt / iters,
    }


class StepTimer:
    """Iteration timer ≙ d2 IterationTimer hook: tracks data vs compute."""

    def __init__(self):
        self.data_s = 0.0
        self.step_s = 0.0
        self.n = 0
        self._t = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        self.data_s += now - self._t
        self._t = now

    def step_done(self):
        now = time.perf_counter()
        self.step_s += now - self._t
        self._t = now
        self.n += 1

    def summary(self) -> dict:
        n = max(self.n, 1)
        return {
            "data_ms": 1000 * self.data_s / n,
            "step_ms": 1000 * self.step_s / n,
            "steps": self.n,
        }
