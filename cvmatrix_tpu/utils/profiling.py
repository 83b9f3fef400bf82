"""Profiling/observability helpers (SURVEY.md §5: the reference has only
wall-clock timing; the TPU build adds profiler traces and GB/s counters).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "device_fence", "Stopwatch"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@jax.jit
def _probe_acc(a, acc):
    return a.reshape(-1)[0].astype(jnp.float32) + acc


def device_fence(tree) -> float:
    """Honest completion barrier: fetch a scalar that depends on ``tree``.

    ``block_until_ready`` can return at enqueue on remote-tunneled runtimes;
    transferring a dependent value to the host cannot. Returns the fetched
    probe value (sum of one element per leaf).
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "ndim")]
    s = jnp.zeros((), jnp.float32)
    for x in leaves:
        s = _probe_acc(x, s)
    return float(s)


class Stopwatch:
    """Wall-clock timer with optional byte counter -> achieved GB/s."""

    def __init__(self, bytes_accessed: Optional[int] = None) -> None:
        self.bytes_accessed = bytes_accessed
        self.elapsed: Optional[float] = None

    def __enter__(self) -> "Stopwatch":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.elapsed = time.perf_counter() - self._t0

    @property
    def gbps(self) -> Optional[float]:
        if self.bytes_accessed is None or not self.elapsed:
            return None
        return self.bytes_accessed / self.elapsed / 1e9
