"""Profiling utilities (reference: `mmdet/utils/profiling.py:10-39`,
`tools/analysis_tools/benchmark.py`).

``profile_time`` is the host-side timing context (the reference's CUDA
events become ``block_until_ready``); ``trace`` wraps ``jax.profiler``
for device traces; ``Throughput`` accumulates images/sec like the
benchmark CLI.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["profile_time", "trace", "Throughput"]


@contextlib.contextmanager
def profile_time(name: str, stream=None, sync: bool = True, logger=None):
    """Time a block; blocks on all pending device work when ``sync``."""
    t0 = time.perf_counter()
    yield
    if sync:
        jax.effects_barrier()
    dt = time.perf_counter() - t0
    msg = f"{name}: {dt * 1000:.2f} ms"
    (logger.info if logger else print)(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


class Throughput:
    """Running images/sec meter (IterTimerHook analog)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.images = 0
        self.start = None

    def step(self, batch_size: int):
        self.count += 1
        if self.count == self.warmup:
            self.start = time.perf_counter()
            self.images = 0
        elif self.count > self.warmup:
            self.images += batch_size

    def rate(self) -> float:
        if self.start is None or self.images == 0:
            return 0.0
        return self.images / (time.perf_counter() - self.start)
