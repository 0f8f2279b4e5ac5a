"""Benchmark & profiling harness.

The reference times with gettimeofday/rdhwr cycle counters around each
kernel (``include/mars_nn_hw.h:160-171``, ``examples/mars_*_bench.c``).
On TPU, dispatch is async and the remote runtime can elide duplicate
dispatches, so honest numbers need (a) ``block_until_ready`` fencing and
(b) data-dependency chaining between iterations. Both harnesses live
here, plus a jax-profiler trace context.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Optional, Tuple

import jax


def time_fn(fn: Callable, *args, iters: int = 10,
            warmup: int = 2) -> float:
    """Average seconds/call with fence-based timing (sufficient when the
    runtime executes every dispatch)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1 (got {iters})")
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def time_fn_chained(step: Callable[[Any], Any], x0: Any,
                    iters: int = 10, warmup: int = 1) -> float:
    """Average seconds/call where ``step: x -> x`` feeds its output back
    as input — no iteration can be elided or overlapped dishonestly.
    Preferred for microbenchmarks on remote/tunneled runtimes."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def throughput(batch: int, seconds_per_call: float) -> float:
    return batch / seconds_per_call if seconds_per_call > 0 else 0.0


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/tat_profile"):
    """jax.profiler trace context (XLA device profile; the TPU analog of
    the reference's register tracers / LD_PRELOAD interposers)."""
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def compiled_stats(fn: Callable, *args) -> dict:
    """Compile-time cost facts from XLA (FLOPs estimate, memory) — the
    static analog of the reference's printed GFLOPS tables."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    out = {}
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        out["flops"] = ca.get("flops")
        out["bytes_accessed"] = ca.get("bytes accessed")
    except Exception:
        pass
    try:
        out["generated_code_size"] = compiled.memory_analysis() \
            .generated_code_size_in_bytes
    except Exception:
        pass
    return out
