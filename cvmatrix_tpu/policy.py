"""Kernel-routing policy: every auto-routing knob in one place.

The engine ships ONE validated configuration (reference bar: one engine
with 8 constructor knobs, ref ``cvmatrix.py:157-167`` — no tuning
surface). The fields here are routing decisions the TPU engine makes on
its own; their defaults are flipped only on recorded hardware A/Bs, and
the members exist so those A/Bs are runnable at all:

- :func:`set_routing` swaps the active policy **and clears every
  registered compiled-program cache**, so the next call re-traces with
  the new routing — an honest in-process A/B (previously impossible: the
  knobs were import-time globals baked into cached jit programs).
- The ``CVMATRIX_TPU_*`` environment variables remain as process-level
  debug overrides, read once at import. They are NOT the supported
  interface; scripts should call ``set_routing``.

Programs jitted by *user code* (e.g. a user's own ``jax.jit`` around
``training_XTX_XTY``) cannot be cleared from here and keep their baked
routing — run such A/Bs in separate processes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Callable, List

__all__ = ["RoutingPolicy", "policy", "set_routing", "register_cache"]


@dataclass(frozen=True)
class RoutingPolicy:
    """Auto-routing decisions for the fold-sweep engine.

    sym_loocv
        Use the symmetric-mirror LOOCV/v3 kernels (compute the upper
        triangle, mirror the rest).
    f32x2 / df64x2
        Two-folds-per-grid-step variants of the packed LOOCV kernels
        (pay only if the fold loop is partly step-overhead-bound).
    batch_syrk
        SYRK contraction for the wide-K batched fold downdate product.
    ozaki_budget_log2
        Trim budget (log2, relative to the per-column scale product) for
        dropping trailing Ozaki slice-product groups. Default -31 (flipped
        from -36 on the 2026-08-18 v5e A/B: weighted TTTT fold phase
        0.149 s -> 0.108 s at P=1000 and 0.231 s -> 0.216 s at P=10000 at
        the bench grid, with the trimmed tail ~4.7e-10 of the column-scale
        product — still >= 1 decade inside the reference's 1e-8 contract
        at bench scale and comparable to the pipeline's other error
        sources; -36 remains available for extra headroom).
    """

    sym_loocv: bool = False
    f32x2: bool = False
    df64x2: bool = False
    batch_syrk: bool = False
    ozaki_budget_log2: int = -31
    # Hoist reduce-sweep operand/stat preparation out of the chunk loop
    # (packed small-fold and v3 mid-band routes, single-chip and mesh).
    # Default on; the off position exists to A/B the hoist against the
    # per-chunk generic body.
    hoist_reduce: bool = True


def _env_policy() -> RoutingPolicy:
    base = RoutingPolicy()

    def flag(name: str, default: bool) -> bool:
        v = os.environ.get(name)
        return default if v is None else v != "0"

    return RoutingPolicy(
        sym_loocv=flag("CVMATRIX_TPU_SYM_LOOCV", base.sym_loocv),
        f32x2=flag("CVMATRIX_TPU_F32X2", base.f32x2),
        df64x2=flag("CVMATRIX_TPU_DF64X2", base.df64x2),
        batch_syrk=flag("CVMATRIX_TPU_BATCH_SYRK", base.batch_syrk),
        ozaki_budget_log2=int(os.environ.get(
            "CVMATRIX_TPU_OZAKI_BUDGET_LOG2", base.ozaki_budget_log2)),
        hoist_reduce=flag("CVMATRIX_TPU_HOIST_REDUCE", base.hoist_reduce),
    )


_ACTIVE = _env_policy()
_CLEARABLE: List[Callable] = []


def policy() -> RoutingPolicy:
    """The active routing policy (consulted at trace time)."""
    return _ACTIVE


def register_cache(cache) -> None:
    """Register a compiled-program cache to be cleared by set_routing.

    Accepts anything with ``cache_clear`` (functools.lru_cache) or
    ``clear_cache`` (jax.jit wrappers).
    """
    _CLEARABLE.append(cache)


def set_routing(**updates) -> RoutingPolicy:
    """Replace routing fields and clear the package's program caches.

    Returns the new active policy. Unknown field names raise (dataclass
    ``replace`` semantics)::

        set_routing(sym_loocv=True)   # next sweep re-traces with sym on
    """
    global _ACTIVE
    _ACTIVE = replace(_ACTIVE, **updates)
    for c in _CLEARABLE:
        clear = getattr(c, "cache_clear", None) or getattr(
            c, "clear_cache", None)
        clear()
    return _ACTIVE
