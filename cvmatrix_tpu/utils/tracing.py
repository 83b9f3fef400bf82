"""Trace-safety helpers.

The reference engine skips data-dependent ``ValueError`` checks when the fold
indices are ``jax.core.Tracer`` instances, deferring validation to a host-side
pre-flight (``cvmatrix/cvmatrix.py:36-38, 619-630, 1071-1078``). We centralise
that discipline here.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["is_concrete", "ensure_x64"]


def is_concrete(x: Any) -> bool:
    """True when ``x`` carries a concrete value we may inspect on the host.

    Under ``jax.jit`` / ``jax.vmap`` / ``shard_map`` tracing, fold indices are
    tracers; data-dependent validity raises must then be skipped (they are the
    caller's host-side pre-flight responsibility — the contract documented at
    reference ``cvmatrix/cvmatrix.py:620-624``).
    """
    if isinstance(x, jax.core.Tracer):
        return False
    return True


def ensure_x64(dtype: Any) -> None:
    """Enable JAX 64-bit mode when an 8-byte-or-wider dtype is requested.

    Mirrors the reference constructor's auto-enable
    (``cvmatrix/cvmatrix.py:181-186``) so a requested float64 is honored
    instead of silently truncating to float32.
    """
    if np.dtype(dtype).itemsize >= 8 and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
