"""Profiling harness.

Replaces the reference's CUDA-event timing (reference
test_flow_latent.py:223-246) and thop FLOP hooks with ``jax.profiler``
traces and transfer-synchronized host timers. On the axon TPU tunnel,
``block_until_ready`` does not wait for remote execution — ``sync`` forces a
scalar device->host transfer instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> None:
    """Force execution to finish: tiny transfer of a reduced scalar."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def measure_latency(fn: Callable, *args, warmup: int = 3, reps: int = 50):
    """Per-call latency stats in ms (the reference's --measure_time shape:
    300 reps after warmup, mean +/- std)."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.mean(times)), float(np.std(times))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope; open with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
