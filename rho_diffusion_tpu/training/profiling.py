"""Profiling / tracing / failure-detection utilities.

The reference had no active tracing (vestiges only: a commented Lightning
profiler, thop FLOP-counter hooks — SURVEY.md §5). Here:

* ``trace(logdir)`` — context manager around jax.profiler for device traces
  viewable in TensorBoard/XProf;
* ``StepTimer`` — wall-clock step statistics (median/p90, steps/sec);
* ``compiled_cost`` — XLA's own FLOP/byte estimates for a jitted function,
  for roofline accounting (replaces thop);
* ``find_nonfinite`` / ``check_finite`` — locate NaN/Inf leaves in a pytree
  with their paths (the reference's failure handling was sys.exit(0) on any
  NaN, ddpm.py:268-272).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall-clock times; cheap enough for every step."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def stats(self, skip_first: int = 1) -> dict[str, float]:
        ts = np.asarray(self.times[skip_first:] or self.times or [0.0])
        return {
            "median_step_s": float(np.median(ts)),
            "p90_step_s": float(np.percentile(ts, 90)),
            "steps_per_sec": float(1.0 / max(np.median(ts), 1e-12)),
            "n_steps": int(len(ts)),
        }


def compiled_cost(fn, *args, **kwargs) -> dict[str, float]:
    """XLA cost analysis (flops / bytes accessed) of ``jit(fn)(*args)``."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return {
        "flops": float(ca.get("flops", float("nan"))),
        "bytes_accessed": float(ca.get("bytes accessed", float("nan"))),
    }


def find_nonfinite(tree: Any) -> list[str]:
    """Paths of pytree leaves containing NaN/Inf (host-side check)."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def check_finite(tree: Any, context: str = "") -> None:
    """Raise with the offending leaf paths if the tree has NaN/Inf
    (replaces the reference's silent sys.exit(0))."""
    bad = find_nonfinite(tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values{' in ' + context if context else ''}: "
            f"{bad[:8]}{'...' if len(bad) > 8 else ''}",
        )
