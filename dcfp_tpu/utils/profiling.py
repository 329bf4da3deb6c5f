"""Profiling / timing utilities (SURVEY.md §5 tracing parity).

The reference brackets timings with ``cuda.synchronize``
(evaluate.py:327-337) and counts FLOPs with forward hooks.  Here:

* ``sync(x)`` — reliable device synchronization by fetching one element
  of the last output to the host.  (``jax.block_until_ready`` can return
  before execution completes on tunneled platforms; device programs
  execute in dispatch order, so one fetch serializes everything before
  it.)
* ``timeit(fn, *args)`` — warmup-excluded wall-clock of a compiled
  callable with proper sync.
* ``trace(dir)`` — context manager around ``jax.profiler`` emitting an
  XPlane trace for the profiler UI.
* ``flops_efficiency`` — achieved FLOP/s vs an analytic FLOP count.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np


def sync(out: Any) -> None:
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[-1].ravel()[0])


def timeit(fn: Callable, *args, warmup: int = 3, iters: int = 10,
           **kwargs) -> Dict[str, float]:
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    return {"ms": dt * 1000.0, "seconds": dt}


@contextlib.contextmanager
def trace(log_dir: str):
    """Emit a profiler trace viewable in XProf/TensorBoard."""
    with jax.profiler.trace(log_dir):
        yield


def flops_efficiency(analytic_flops: float, seconds: float,
                     peak_tflops: float = 197.0) -> Dict[str, float]:
    """Achieved TFLOP/s and fraction of peak (defaults to TPU v5e bf16)."""
    achieved = analytic_flops / seconds / 1e12
    return {"tflops": achieved, "fraction_of_peak": achieved / peak_tflops}
