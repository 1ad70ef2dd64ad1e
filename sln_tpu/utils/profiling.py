"""Profiling / tracing utilities.

First-class replacement for the reference's cuda-synchronize timeit
(utils.py:127-137): device-synchronized wall timing, steady-state op
benchmarking, and jax.profiler trace capture for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def timeit(msg: str, should_time: bool = True, sync_on=None):
    """Device-synchronized timing context (reference utils.py:127-137
    semantics; block_until_ready replaces torch.cuda.synchronize)."""
    if not should_time:
        yield
        return
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    t0 = time.perf_counter()
    result = {}
    yield result
    if sync_on is not None:
        jax.block_until_ready(sync_on)
    ms = (time.perf_counter() - t0) * 1000.0
    result["ms"] = ms
    print(f"{msg}: {ms:.2f} ms")


def benchmark(fn: Callable, *args, warmup: int = 2, iters: int = 20
              ) -> float:
    """Steady-state ms/call of a jitted function (compile excluded)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sln_trace"):
    """Capture a jax.profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"trace written to {log_dir}")


def step_timer():
    """Returns a callable reporting steps/sec over its call interval."""
    state = {"t": None, "steps": 0}

    def tick(n: int = 1) -> Optional[float]:
        state["steps"] += n
        now = time.perf_counter()
        if state["t"] is None:
            state["t"] = now
            state["steps"] = 0
            return None
        dt = now - state["t"]
        if dt <= 0:
            return None
        rate = state["steps"] / dt
        state["t"] = now
        state["steps"] = 0
        return rate

    return tick
