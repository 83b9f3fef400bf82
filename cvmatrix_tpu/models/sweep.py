"""High-level cross-validation sweep driver.

The reference leaves fold batching to the caller (its benchmark/examples
hand-roll size-bucketing + ``jit(vmap(...))`` chunking —
``benchmarks/benchmark.py:136-152``). This driver makes that a library
feature: one call computes every fold's training matrices with

- size-bucketed (or padded+masked) fold batches — one compiled program per
  distinct fold size (or exactly one program with masking),
- chunking chosen from an HBM budget so outputs never overflow device memory,
- per-fold results yielded as device arrays, keyed by fold.
"""

from __future__ import annotations

from typing import Dict, Hashable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CVConfig
from ..core.fold import training_matrices
from ..core.state import FitState
from .partitioner import Partitioner

__all__ = ["cross_validate"]


def _auto_batch(n_folds: int, k: int, m: int, itemsize: int,
                budget_bytes: float) -> int:
    per_fold = (k * k + k * m + 4 * (k + m)) * itemsize
    # x3: outputs live while the next chunk is being produced + gather temps.
    return max(1, min(n_folds, int(budget_bytes / (3 * per_fold))))


def cross_validate(
    config: CVConfig,
    state: FitState,
    partitioner: Partitioner,
    *,
    return_XTX: bool = True,
    return_XTY: bool = True,
    batch_size: Optional[int] = None,
    hbm_budget_bytes: float = 4e9,
    use_padding: bool = False,
) -> Iterator[Tuple[list, object]]:
    """Yield ``(fold_keys, results)`` per compiled chunk, covering all folds.

    ``results`` has the same structure as :func:`training_matrices` with a
    leading fold axis. With ``use_padding=True`` all folds run through ONE
    program (padded + masked); otherwise one program per distinct fold size.
    """
    k = state.K
    m = state.M or 0
    itemsize = np.dtype(config.dtype).itemsize

    fold_fn = jax.jit(
        jax.vmap(
            lambda st, v, mk: training_matrices(
                config, st, v, mk,
                return_XTX=return_XTX, return_XTY=return_XTY,
            ),
            in_axes=(None, 0, 0),
        ),
    )
    fold_fn_nomask = jax.jit(
        jax.vmap(
            lambda st, v: training_matrices(
                config, st, v,
                return_XTX=return_XTX, return_XTY=return_XTY,
            ),
            in_axes=(None, 0),
        ),
    )

    if use_padding:
        keys, idx, mask = partitioner.padded_batches()
        groups = [(keys, idx, mask)]
    else:
        groups = [
            (ks, batch, None) for ks, batch in partitioner.size_buckets()
        ]

    for keys, idx, mask in groups:
        bs = batch_size or _auto_batch(len(keys), k, m, itemsize,
                                       hbm_budget_bytes)
        idx_d = jnp.asarray(idx)
        mask_d = None if mask is None else jnp.asarray(mask, config.dtype)
        for s in range(0, len(keys), bs):
            chunk_idx = idx_d[s : s + bs]
            if mask_d is None:
                out = fold_fn_nomask(state, chunk_idx)
            else:
                out = fold_fn(state, chunk_idx, mask_d[s : s + bs])
            yield keys[s : s + bs], out


def cross_validate_dict(
    config: CVConfig,
    state: FitState,
    partitioner: Partitioner,
    **kw,
) -> Dict[Hashable, object]:
    """Materialise :func:`cross_validate` into a fold -> result dict."""
    out: Dict[Hashable, object] = {}
    for keys, res in cross_validate(config, state, partitioner, **kw):
        for i, key in enumerate(keys):
            out[key] = jax.tree.map(lambda a: a[i], res)
    return out
