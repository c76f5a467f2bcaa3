"""Profiling/tracing helpers.

The reference's tracing surface is the `append_profile_to_logs`
wall-time decorator (task_helper/base.py:48-65, mirrored in
tasks/base.py here). The TPU build adds first-class device tracing:

- `trace(logdir)` context manager around steps -> a TensorBoard/XProf
  trace of the actual device programs,
- `time_jitted(fn, *args)` -> compile time + steady-state latency with
  proper `block_until_ready` fencing (host wall-clock lies under async
  dispatch).
"""
import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str, **kwargs):
    """Capture a device trace: `with trace('/tmp/tb'): step(...)`."""
    jax.profiler.start_trace(logdir, **kwargs)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


def time_jitted(
    fn: Callable,
    *args: Any,
    iters: int = 10,
    warmup: int = 1,
) -> Tuple[float, float]:
    """Return (first_call_seconds, steady_state_seconds_per_call)."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.perf_counter() - t0

    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t0) / iters
    return first, steady
