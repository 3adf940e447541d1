"""Profiling / timing harness (SURVEY.md §5 "Tracing / profiling").

- ``timed``: block-until-ready wall timing with warmup (the honest way to
  time jitted code).
- ``trace_to``: context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace directory.
- ``cost_analysis``: XLA's per-executable FLOP/byte estimates for a jitted
  function at given args.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Tuple

import jax


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 3) -> Tuple[float, Any]:
    """(best_seconds, last_result) of fn(*args) with device sync."""
    out = None
    for _ in range(max(0, warmup)):
        out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace_to(logdir: str):
    """Profile a region into ``logdir`` (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis (flops, bytes accessed) of the jitted fn at args."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a list per-device
        ca = ca[0] if ca else {}
    return dict(ca) if ca else {}
