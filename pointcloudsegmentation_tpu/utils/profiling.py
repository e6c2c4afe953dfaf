"""Profiling & tracing utilities.

TPU replacement for the reference's TF full-trace Chrome timelines
(model_pooling.py:608-619, tf_ops/test/test_speed.py:55-80):
``jax.profiler`` traces viewable in Perfetto/TensorBoard, plus simple
steady-state step timers and a throughput counter matching the reference's
``examples/s`` log line (train_gpn_scannet_new.py:169-183).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace (the Chrome-timeline analog):

        with profiling.trace("/tmp/trace"):
            train_step(...)
        # then: tensorboard --logdir /tmp/trace  (or open in Perfetto)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> Dict[str, float]:
    """Steady-state wall-clock of a device function (op-level test_speed
    analog).  Returns ms/call statistics."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return {"ms_median": times[len(times) // 2], "ms_min": times[0],
            "ms_max": times[-1],
            "ms_mean": sum(times) / len(times)}


class Throughput:
    """Streaming blocks/s + points/s counter (the reference's per-log_step
    examples/s line)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.blocks = 0
        self.points = 0

    def update(self, blocks: int, points: int):
        self.blocks += blocks
        self.points += points

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {"blocks_per_sec": self.blocks / dt,
                "points_per_sec": self.points / dt}
