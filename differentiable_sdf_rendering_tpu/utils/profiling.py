"""Kernel timing / tracing.

Replaces the reference's Dr.Jit ``kernel_history`` profiling
(``/root/reference/figures/benchmark/benchmark.py:37-72``,
``figures/result_utils.py:142,158-160``) with ``block_until_ready`` wall
timing and optional ``jax.profiler`` traces (view with Perfetto/TensorBoard).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["device_time", "Timer", "trace"]


def _force(out):
    """Force completion: on the remote-TPU (axon) platform
    ``block_until_ready`` can return before execution finishes, so fetch a
    small reduction of the first leaf."""
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    return out


def device_time(fn, *args, n_runs: int = 5, warmup: int = 1, **kwargs):
    """Mean device execution time of ``fn(*args)`` (seconds), with compile
    excluded via warmup runs — the role of kernel-history 'execution_time'."""
    for _ in range(warmup):
        out = _force(fn(*args, **kwargs))
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        out = _force(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return sum(times) / len(times), out


class Timer:
    """Accumulating section timer (metadata.json 'total_time' bookkeeping)."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
