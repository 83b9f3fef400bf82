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

import weakref
from functools import lru_cache
from typing import Dict, Hashable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CVConfig
from ..core.fold import training_matrices
from ..core.state import FitState
from ..policy import register_cache as _register_routing_cache
from ..utils.fnkey import HashableFn as _HashableFn
from .partitioner import Partitioner

__all__ = ["cross_validate", "cross_validate_reduce", "materialize_cv",
           "materialize_sweep"]


def _auto_batch(n_folds: int, k: int, m: int, itemsize: int,
                budget_bytes: float) -> int:
    per_fold = (k * k + k * m + 4 * (k + m)) * itemsize
    # x3: outputs live while the next chunk is being produced + gather temps.
    return max(1, min(n_folds, int(budget_bytes / (3 * per_fold))))


def _pad_folds(idx, mask, bs):
    """Pad the fold axis to a multiple of ``bs`` by repeating the last fold
    (<1 chunk of duplicate work) — a separate remainder chunk would compile
    a SECOND whole sweep program per configuration."""
    pad = (-idx.shape[0]) % bs
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(idx[-1:], (pad,) + idx.shape[1:])]
        )
        if mask is not None:
            mask = jnp.concatenate(
                [mask, jnp.broadcast_to(mask[-1:], (pad,) + mask.shape[1:])]
            )
    return idx, mask


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

    fold_fn = _cv_fold_fn(config, return_XTX, return_XTY, True)
    fold_fn_nomask = _cv_fold_fn(config, return_XTX, return_XTY, False)

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


@lru_cache(maxsize=128)
def _cv_fold_fn(config, return_XTX, return_XTY, with_mask):
    """Cached jitted vmapped fold program for :func:`cross_validate`
    (a fresh per-call ``jax.jit`` wrapper would recompile on every sweep)."""
    if with_mask:
        return jax.jit(
            jax.vmap(
                lambda st, v, mk: training_matrices(
                    config, st, v, mk,
                    return_XTX=return_XTX, return_XTY=return_XTY,
                ),
                in_axes=(None, 0, 0),
            ),
        )
    return jax.jit(
        jax.vmap(
            lambda st, v: training_matrices(
                config, st, v,
                return_XTX=return_XTX, return_XTY=return_XTY,
            ),
            in_axes=(None, 0),
        ),
    )


def cross_validate_reduce(
    config: CVConfig,
    state: FitState,
    idx_batch,
    mask_batch=None,
    *,
    reduce_fn,
    return_XTX: bool = True,
    return_XTY: bool = True,
    batch_size: int = 512,
    impl: str = "auto",
    donate_state: bool = False,
):
    """Map ``reduce_fn`` over every fold's training matrices — ON DEVICE.

    The single-dispatch CV sweep. :func:`cross_validate` returns control to
    Python between chunks; on accelerators behind a dispatch boundary (and on
    any TPU at LOOCV scale) per-chunk dispatch latency then dominates the
    actual math by multiples. This driver instead compiles ONE program: a
    ``lax.scan`` over fold chunks whose body computes a chunk's training
    matrices with ``jax.vmap`` and immediately consumes them with
    ``reduce_fn`` — fold outputs never leave HBM, and only the (small)
    reductions are stacked and returned. This mirrors real downstream use
    (e.g. per-fold regression coefficients), where the K x K / K x M
    matrices are intermediates, not artifacts.

    Parameters
    ----------
    idx_batch : (P, L) per-fold validation indices (see
        :meth:`Partitioner.padded_batches`). ``P`` is padded internally to a
        multiple of ``batch_size`` by repeating the last fold; padded results
        are dropped before returning.
    mask_batch : optional (P, L) 0/1 validity mask for padded fold rows.
    reduce_fn : ``(matrices, stats) -> pytree`` applied per fold under
        ``vmap`` (so it must be traceable). ``matrices``/``stats`` have the
        same structure as :func:`training_matrices` for one fold.
    batch_size : folds per scan step; bounds peak HBM for fold outputs.
    impl : forwarded to the chunk computation — ``"auto"`` routes each
        chunk's matrices through the fused Pallas kernels on TPU
        (double-float for f64) and the vmapped XLA engine elsewhere.
    donate_state : donate ``state``'s buffers to the sweep. XLA then frees
        the K x K global product once the kernel's total planes are built —
        at genomics-wide K that is gigabytes of HBM. The state is CONSUMED
        (unusable afterwards); refit to reuse.

    Returns the stacked reductions with leading axis ``P``.
    """
    from ..core.batch import training_matrices_batched

    idx = jnp.asarray(idx_batch)
    n_folds = idx.shape[0]
    mask = None if mask_batch is None else jnp.asarray(mask_batch, config.dtype)
    bs = min(batch_size, n_folds)
    # Equalize chunk sizes: padding to a multiple of a near-n chunk size
    # can almost double the sweep (n=1000, bs=953 -> padded to 1906).
    n_chunks = -(-n_folds // bs)
    bs = -(-n_folds // n_chunks)
    idx, mask = _pad_folds(idx, mask, bs)
    n_chunks = idx.shape[0] // bs
    idx_c = idx.reshape(n_chunks, bs, *idx.shape[1:])
    mask_c = None if mask is None else mask.reshape(n_chunks, bs, *mask.shape[1:])

    runner = _reduce_sweep_jit_donated if donate_state else _reduce_sweep_jit
    # HashableFn: reduce_fn is a static arg, and static args hash by
    # identity — a fresh-but-identical lambda per call would recompile the
    # whole sweep program. The wrapper keys on code + closure values.
    out = runner(
        config, return_XTX, return_XTY, impl, _HashableFn(reduce_fn),
        state, idx_c, mask_c
    )
    out = jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:])[:n_folds], out)
    return out


def _reduce_sweep_impl(config, return_XTX, return_XTY, impl, reduce_fn,
                       state, idx_c, mask_c):
    from ..core.batch import (
        _HOIST_BUDGET_BYTES,
        _hoist_reduce_enabled,
        _hoisted_operand_bytes,
        _padded_dims,
        _total_planes,
        _v3_hoist_bytes,
        LARGE_FOLD_ROWS,
        large_fold_threshold,
        loocv_single_tile_ok,
        ozaki_v3_ok,
        training_matrices_batched,
    )

    # LOOCV fast path: the all-in-one kernel with operand streams hoisted
    # ONCE over the whole sweep (the structure the materialize sweep and
    # the mesh identity path already use) — the generic chunk body below
    # re-runs prepare_fold_operands' gathers/stats/packing per chunk, a
    # measurable multiple of the actual fold math at single-row folds.
    if (
        impl in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and np.dtype(config.dtype).itemsize in (4, 8)
        and mask_c is None
        and idx_c.shape[2] == 1
        and return_XTX
        and loocv_single_tile_ok(config, state, return_XTX, return_XTY)
    ):
        return _loocv_reduce_loop(
            config, state, idx_c, reduce_fn, return_XTY,
        )

    # Small-fold fast path: hoist prepare_fold_operands ONCE over the whole
    # sweep (the materialize sweep's structure) instead of re-running its
    # gathers/stats/packing per chunk — at P=10k mid-band folds the
    # per-chunk prep was a measurable multiple of the packed-kernel math
    # (round-4 diag: mesh fold math 1.21x the hoisted single-chip sweep).
    # reduce_fn consumption slices the hoisted stat streams per chunk.
    n_l = idx_c.shape[2]
    if (
        impl in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and _hoist_reduce_enabled()
        and np.dtype(config.dtype).itemsize in (4, 8)
        and n_l < (
            large_fold_threshold(config, state, return_XTX, return_XTY)
            if np.dtype(config.dtype).itemsize == 8 else LARGE_FOLD_ROWS
        )
        and _hoisted_operand_bytes(
            state, idx_c.shape[0] * idx_c.shape[1], n_l,
            return_XTX, return_XTY) <= _HOIST_BUDGET_BYTES
    ):
        return _smallfold_reduce_loop(
            config, state, idx_c, mask_c, reduce_fn, return_XTX, return_XTY,
        )

    # Mid-band fast path (L >= threshold, v3-eligible): hoist the dataset
    # slice planes + per-fold vector streams ONCE (the materialize sweep's
    # _v3_sweep_loop structure) and add a hoisted stats pass for reduce_fn;
    # the generic body below instead re-slices every chunk's rows through
    # the untrimmed exact contraction — the per-chunk prep the round-4
    # mid-band diag measured.
    if (
        impl in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and _hoist_reduce_enabled()
        and np.dtype(config.dtype).itemsize == 8
        and return_XTX
        and n_l >= large_fold_threshold(config, state, return_XTX,
                                        return_XTY)
        and ozaki_v3_ok(config, state, return_XTX, return_XTY, n_l)
        and _v3_hoist_bytes(state, idx_c.shape[0] * idx_c.shape[1],
                            n_l) <= _HOIST_BUDGET_BYTES
    ):
        return _v3_reduce_loop(
            config, state, idx_c, mask_c, reduce_fn, return_XTY,
        )

    # Hoist the kernel's padded total planes out of the chunk loop: built
    # inside the loop they pin state's K x K product for the whole sweep
    # (with donation, freeing it saves gigabytes at genomics-wide K).
    planes = None
    if (
        impl in ("auto", "pallas")
        and jax.default_backend() == "tpu"
        and np.dtype(config.dtype).itemsize == 8
        and idx_c.shape[2] >= large_fold_threshold(
            config, state, return_XTX, return_XTY)
    ):
        _, _, kp, cp, _ = _padded_dims(state, return_XTX, return_XTY)
        planes = _total_planes(state, return_XTX, return_XTY, kp, cp,
                               presplit=False)

    def one_chunk(ci, cm):
        mats, stats = training_matrices_batched(
            config, state, ci, cm,
            return_XTX=return_XTX, return_XTY=return_XTY, impl=impl,
            _total_planes_override=planes,
        )
        return jax.vmap(reduce_fn)(mats, stats)

    def body(_, chunk):
        ci, cm = chunk
        return None, one_chunk(ci, cm)

    _, stacked = jax.lax.scan(body, None, (idx_c, mask_c))
    return stacked


def _loocv_reduce_loop(config, state, idx_c, reduce_fn, return_XTY,
                       interpret=False):
    """Hoisted-source LOOCV reduce sweep (single-row folds, any order).

    Mirrors the mesh identity path's chunk body
    (:func:`cvmatrix_tpu.parallel.distributed._loocv_identity_program`):
    one :func:`prepare_loocv_sources` for the whole fold list, then a scan
    whose steps run the all-in-one LOOCV kernel, convert the double-float
    pair planes, recompute the API stats from a fresh row gather, and
    immediately reduce. Unlike the identity path it takes the folds in the
    caller's order (positions in the hoisted streams are fold-list
    positions, so no natural-order requirement).
    """
    from ..core.batch import (
        _df64x2_enabled,
        _f32x2_enabled,
        _sym_enabled,
        loocv_f32_from_sources,
        loocv_from_sources,
        loocv_sym_from_sources,
        loocv_sym_tile,
        prepare_loocv_sources,
        stats_from_blocks,
    )
    from ..core.fold import gather_val_blocks
    from ..ops.df64 import df_to_f64

    is_f64 = np.dtype(config.dtype).itemsize == 8
    n_chunks, bs = idx_c.shape[0], idx_c.shape[1]
    idx = idx_c.reshape(n_chunks * bs, 1)
    src = prepare_loocv_sources(
        config, state, idx, return_XTX=True, return_XTY=return_XTY,
        presplit=None if is_f64 else False,
    )
    rows_all = idx[:, 0].astype(jnp.int32)
    k = state.K
    m = (state.M or 0) if return_XTY else 0
    c_full = k + m
    bt_sym = loocv_sym_tile(src.kp) if (is_f64 and _sym_enabled()) else None

    def body(carry, c):
        ci = jax.lax.dynamic_slice_in_dim(rows_all, c * bs, bs, 0)
        sc = jax.lax.dynamic_slice_in_dim(src.scal, c * bs, bs, 0)
        if is_f64:
            if bt_sym is not None:
                pair = loocv_sym_from_sources(
                    config, src, ci, sc, return_XTY=return_XTY, bt=bt_sym,
                    interpret=interpret,
                )
            else:
                pair = loocv_from_sources(
                    config, src, ci, sc, return_XTY=return_XTY,
                    two_per_step=_df64x2_enabled() and bs % 2 == 0,
                    interpret=interpret,
                )
            out = df_to_f64(pair[:, 0, :k, :c_full], pair[:, 1, :k, :c_full])
        else:
            out32 = loocv_f32_from_sources(
                config, src, ci, sc, return_XTY=return_XTY,
                two_per_step=_f32x2_enabled() and bs % 2 == 0,
                interpret=interpret,
            )
            out = out32[:, :k, :c_full]
        mats = (out[:, :, :k], out[:, :, k:]) if return_XTY else out
        blocks = jax.vmap(
            lambda v: gather_val_blocks(config, state, v, None, return_XTY)
        )(ci[:, None])
        stats5 = stats_from_blocks(config, state, blocks, True, return_XTY)
        return carry, jax.vmap(reduce_fn)(mats, stats5[:4])

    _, red = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return red


def _v3_reduce_loop(config, state, idx_c, mask_c, reduce_fn, return_XTY,
                    interpret=False):
    """Hoisted-source mid-band reduce sweep (v3 fused Ozaki kernel).

    The reduce counterpart of :func:`_v3_sweep_loop`: dataset slice planes
    and per-fold vector streams built ONCE (:func:`prepare_ozaki_sources`),
    plus one hoisted gather+stats pass for the streams ``reduce_fn``
    consumes; the scan body is a fused row gather + the prefix-stack MXU
    kernel + pair conversion + reduction.
    """
    from ..core.batch import (
        _gather_and_stats,
        ozaki_v3_from_sources,
        prepare_ozaki_sources,
    )
    from ..ops.df64 import df_to_f64

    n_chunks, bs, n_l = idx_c.shape
    idx = idx_c.reshape(n_chunks * bs, n_l)
    mask = None if mask_c is None else mask_c.reshape(n_chunks * bs, n_l)
    src = prepare_ozaki_sources(
        config, state, idx, mask, return_XTX=True, return_XTY=return_XTY,
    )
    _, stats5 = _gather_and_stats(config, state, idx, mask, True,
                                  return_XTY)
    stats = stats5[:4]
    k = state.K
    m = (state.M or 0) if return_XTY else 0
    c = k + m
    lp = src.lp
    rows_flat = src.idx.reshape(-1).astype(jnp.int32)
    mask_flat = (
        None if src.mask2d is None
        else src.mask2d.reshape(-1).astype(jnp.float32)
    )

    def body(carry, ci):
        r0 = ci * (bs * lp)
        rows = jax.lax.dynamic_slice_in_dim(rows_flat, r0, bs * lp, 0)
        mk = (
            None if mask_flat is None
            else jax.lax.dynamic_slice_in_dim(mask_flat, r0, bs * lp, 0)
        )
        sx = jax.lax.dynamic_slice_in_dim(src.sxv, ci * bs, bs, 0)
        sc = jax.lax.dynamic_slice_in_dim(src.scal, ci * bs, bs, 0)
        yv = jax.lax.dynamic_slice_in_dim(src.yvec, ci * bs, bs, 0)
        pair = ozaki_v3_from_sources(
            config, src, rows, mk, sx, sc, yv, return_XTY=return_XTY,
            interpret=interpret,
        )
        out = df_to_f64(pair[:, 0, :k, :c], pair[:, 1, :k, :c])
        mats = (out[:, :, :k], out[:, :, k:]) if return_XTY else out
        st_c = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, ci * bs, bs, 0), stats
        )
        return carry, jax.vmap(reduce_fn)(mats, st_c)

    _, red = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return red


def _smallfold_reduce_loop(config, state, idx_c, mask_c, reduce_fn,
                           return_XTX, return_XTY, interpret=False):
    """Hoisted-prep small-fold reduce sweep (L below the MXU threshold).

    The reduce counterpart of :func:`materialize_sweep`'s packed path:
    :func:`~cvmatrix_tpu.core.batch.prepare_fold_operands` runs ONCE for
    every fold (gathers, downdated stats, factor scaling, pair conversion,
    packing), then a scan slices the operand and stat streams per chunk,
    runs the packed downdate kernel, converts the pair planes and
    immediately reduces. Same reduce_fn contract as the generic body
    (f64/f32 matrices + the stats 4-tuple).
    """
    from ..core.batch import (
        downdate_from_operands,
        prepare_fold_operands,
        slice_operands,
    )
    from ..ops import kernels as _k
    from ..ops.df64 import df_to_f64

    is_f64 = np.dtype(config.dtype).itemsize == 8
    n_chunks, bs = idx_c.shape[0], idx_c.shape[1]
    idx = idx_c.reshape(n_chunks * bs, idx_c.shape[2])
    mask = (
        None if mask_c is None
        else mask_c.reshape(n_chunks * bs, mask_c.shape[2])
    )
    ops, stats = prepare_fold_operands(
        config, state, idx, mask,
        return_XTX=return_XTX, return_XTY=return_XTY, with_stats=True,
    )
    k, c = ops.k, ops.c

    def body(carry, ci):
        o = slice_operands(ops, ci * bs, bs)
        if is_f64:
            pair = downdate_from_operands(o, interpret=interpret)
            out = df_to_f64(pair[:, 0, :k, :c], pair[:, 1, :k, :c])
        else:
            out32 = _k.fused_downdate_f32_packed(
                o.total4, o.u, o.v, o.kvec, o.cvec,
                center=o.center, scale=o.scale, interpret=interpret,
            )
            out = out32[:, :k, :c]
        mats = (
            (out[:, :, :k], out[:, :, k:]) if (return_XTX and return_XTY)
            else out
        )
        st_c = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, ci * bs, bs, 0), stats
        )
        return carry, jax.vmap(reduce_fn)(mats, st_c)

    _, red = jax.lax.scan(
        body, None, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return red


# Module-level jit: repeat sweeps with the same (config, flags, reduce_fn)
# and shapes hit the compilation cache instead of re-tracing per call.
_reduce_sweep_jit = jax.jit(_reduce_sweep_impl, static_argnums=(0, 1, 2, 3, 4))
# Donating the fitted state lets XLA free its K x K product (gigabytes at
# genomics-wide K) once the kernel's total planes are built — the state is
# consumed. Opt-in via donate_state=True.
_reduce_sweep_jit_donated = jax.jit(
    _reduce_sweep_impl, static_argnums=(0, 1, 2, 3, 4), donate_argnums=(5,)
)


def materialize_sweep(
    config: CVConfig,
    state: FitState,
    idx_batch,
    mask_batch=None,
    *,
    batch_size: Optional[int] = None,
    impl: str = "auto",
    return_XTX: bool = True,
    return_XTY: bool = True,
    jit: bool = True,
    hbm_budget_bytes: float = 4e9,
):
    """Produce EVERY fold's training matrices in HBM; return a probe scalar.

    The throughput primitive behind the benchmarks: one compiled
    ``lax.fori_loop`` walks the fold chunks, each chunk's full matrices are
    materialised in device memory (written into the loop-carried buffer so
    no fold can be dead-code-eliminated) and overwritten by the next chunk —
    the materialise-then-consume lifecycle of the reference's chunked driver
    (``benchmarks/benchmark.py:148-152``) without per-chunk host dispatch.
    On TPU float64 the chunks route through the double-float Pallas kernel
    with raw hi/lo pair output (``hi + lo`` is the f64 value, 8 B/element).

    Returns a scalar jax array that depends on the final buffer; fetching it
    to the host is the completion barrier for the whole sweep.
    """
    idx = jnp.asarray(idx_batch)
    mask = None if mask_batch is None else jnp.asarray(mask_batch, config.dtype)
    n_folds = idx.shape[0]
    dt = np.dtype(config.dtype)
    if batch_size is None:
        # Bound the loop-carried chunk buffers (double-buffered while-loop
        # carry) by the HBM budget: a fold's materialised matrices are
        # ~8 bytes/element regardless of engine dtype (f64 pairs or f64).
        k = state.K
        c = (k if return_XTX else 0) + ((state.M or 0) if return_XTY else 0)
        per_fold = 2 * 8 * max(k * c, 1)
        batch_size = max(1, min(2000, int(hbm_budget_bytes / per_fold)))
    bs = min(batch_size, n_folds)
    # Equalize chunk sizes (see cross_validate_reduce): pad < n_chunks folds.
    n_chunks_eq = -(-n_folds // bs)
    bs = -(-n_folds // n_chunks_eq)
    on_tpu = jax.default_backend() == "tpu"
    use_pairs = impl != "xla" and on_tpu and dt.itemsize == 8
    use_f32_packed = impl != "xla" and on_tpu and dt.itemsize == 4
    if bs % 2 and (use_f32_packed or use_pairs):
        from ..core.batch import _df64x2_enabled, _f32x2_enabled

        if (use_f32_packed and _f32x2_enabled()) or (
                use_pairs and _df64x2_enabled()):
            bs += 1  # the two-folds-per-step kernels need an even chunk
    kernel_impl = "pallas" if (use_pairs or use_f32_packed) else impl

    idx, mask = _pad_folds(idx, mask, bs)
    n_chunks = idx.shape[0] // bs
    runner = _materialize_sweep_jit if jit else _materialize_sweep_impl
    return runner(
        config, bs, n_chunks, return_XTX, return_XTY, kernel_impl,
        use_pairs or use_f32_packed, state, idx, mask,
    )


def _materialize_sweep_impl(
    config, bs, n_chunks, return_XTX, return_XTY, impl, use_packed,
    state, idx, mask,
):
    from ..core.batch import (
        _df64x2_enabled,
        _f32x2_enabled,
        _sym_enabled,
        downdate_from_operands,
        loocv_f32_from_sources,
        loocv_from_sources,
        loocv_single_tile_ok,
        loocv_sym_from_sources,
        loocv_sym_tile,
        prepare_fold_operands,
        prepare_loocv_sources,
        slice_operands,
        training_matrices_batched,
    )

    is_f64 = np.dtype(config.dtype).itemsize == 8
    # All-in-one LOOCV kernel: gathers, statistics, downdate and epilogue in
    # ONE Pallas pass per fold — no hoisted operand streams at all. Applies
    # to single-row folds whose [X | Y] output fits one square tile. (The
    # general small-L sibling, fused_smallfold_df64, measured ~13% SLOWER
    # than the hoisted-prep packed kernel at L=4-10 on a v5e — its
    # reference-form epilogue costs more per element than the prep it saves
    # — so L > 1 stays on the packed path.)
    if (
        use_packed and mask is None and idx.shape[1] == 1
        and loocv_single_tile_ok(config, state, return_XTX, return_XTY)
    ):
        n = n_chunks * bs
        src = prepare_loocv_sources(
            config, state, idx[:n],
            return_XTX=return_XTX, return_XTY=return_XTY,
            presplit=None if is_f64 else False,
        )
        rows = idx[:n, 0].astype(jnp.int32)
        # Symmetric-mirror variant: the XTX block is symmetric per fold, so
        # strictly-lower output tiles are in-VMEM transposes instead of
        # recomputed epilogue — the flop cut on the VPU-bound all-flags
        # path. CVMATRIX_TPU_SYM_LOOCV=0 forces the full kernel (A/B knob).
        bt_sym = loocv_sym_tile(src.kp) if (is_f64 and _sym_enabled()) else None

        def body(c, carry):
            ci = jax.lax.dynamic_slice_in_dim(rows, c * bs, bs, 0)
            sc = jax.lax.dynamic_slice_in_dim(src.scal, c * bs, bs, 0)
            if bt_sym is not None:
                return loocv_sym_from_sources(
                    config, src, ci, sc, return_XTY=return_XTY, bt=bt_sym,
                )
            if is_f64:
                return loocv_from_sources(
                    config, src, ci, sc, return_XTY=return_XTY,
                    two_per_step=_df64x2_enabled() and bs % 2 == 0,
                )
            return loocv_f32_from_sources(
                config, src, ci, sc, return_XTY=return_XTY,
                two_per_step=_f32x2_enabled() and bs % 2 == 0,
            )

        shape = (bs, 2, src.kp, src.cp) if is_f64 else (bs, src.kp, src.cp)
        buf = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros(shape, jnp.float32))
        return buf.reshape(-1)[0]
    # Hoisted-prep fast path (small folds): gathers, stats, scaling, pair
    # conversion and packing run ONCE for all folds; the loop body is two
    # slices plus the packed kernel. Large folds instead route per chunk
    # through the MXU-product paths inside training_matrices_batched
    # (hoisting L-row streams for every fold would blow HBM at scale).
    from ..core.batch import (
        large_fold_threshold,
        ozaki_v3_ok,
        ozaki_v3_from_sources,
        prepare_ozaki_sources,
    )

    n_l = idx.shape[1]
    threshold = large_fold_threshold(config, state, return_XTX, return_XTY)
    # v3 fused Ozaki: dataset slice planes + ONE fused XLA gather per chunk
    # feeding trimmed prefix-stack MXU products (kernels.py docstrings for
    # the measured v2 -> v3 rationale). Sweeps don't need host-visible
    # stats, so no per-fold f64 row gathers or stat vectors run in XLA.
    # Accuracy note: global-scale slicing, the diagonal-derived squared
    # sums and the trimmed groups cost ~1 extra bit vs v1 (~1e-12 relative
    # at bench scale — orders of magnitude inside the reference's
    # 1e-8-at-test-scale contract).
    if (
        use_packed and is_f64 and n_l >= threshold
        and ozaki_v3_ok(config, state, return_XTX, return_XTY, n_l)
    ):
        n = n_chunks * bs
        src = prepare_ozaki_sources(
            config, state, idx[:n], None if mask is None else mask[:n],
            return_XTX=return_XTX, return_XTY=return_XTY,
        )
        return _v3_sweep_loop(config, src, bs, n_chunks, return_XTY)

    if use_packed and idx.shape[1] < threshold:
        n = n_chunks * bs
        ops, _ = prepare_fold_operands(
            config, state, idx[:n],
            None if mask is None else mask[:n],
            return_XTX=return_XTX, return_XTY=return_XTY,
            with_stats=False,
        )
        kp, cp = ops.total4.shape[1], ops.total4.shape[2]
        if is_f64:
            produce = downdate_from_operands
            buf0 = jnp.zeros((bs, 2, kp, cp), jnp.float32)
        else:
            from ..ops import kernels as _k

            def produce(o):
                return _k.fused_downdate_f32_packed(
                    o.total4, o.u, o.v, o.kvec, o.cvec,
                    center=o.center, scale=o.scale,
                )

            buf0 = jnp.zeros((bs, kp, cp), jnp.float32)

        def body(c, carry):
            return produce(slice_operands(ops, c * bs, bs))

        buf = jax.lax.fori_loop(0, n_chunks, body, buf0)
        return buf.reshape(-1)[0]

    pair = use_packed and is_f64

    def chunk_mats(st, ci, cm):
        out, _ = training_matrices_batched(
            config, st, ci, cm,
            return_XTX=return_XTX, return_XTY=return_XTY,
            impl=impl,
            pair_output=pair,
            trim_output=not pair,
        )
        return out

    sds = jax.eval_shape(
        chunk_mats, state,
        jax.ShapeDtypeStruct((bs,) + idx.shape[1:], idx.dtype),
        None if mask is None
        else jax.ShapeDtypeStruct((bs,) + mask.shape[1:], mask.dtype),
    )

    def body(c, carry):
        ci = jax.lax.dynamic_slice_in_dim(idx, c * bs, bs, 0)
        cm = (
            None if mask is None
            else jax.lax.dynamic_slice_in_dim(mask, c * bs, bs, 0)
        )
        return chunk_mats(state, ci, cm)

    bufs = jax.lax.fori_loop(
        0, n_chunks, body,
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sds),
    )
    return sum(leaf.reshape(-1)[0] for leaf in jax.tree.leaves(bufs))


def _v3_sweep_loop(config, src, bs, n_chunks, return_XTY):
    """fori_loop over fold chunks through the v3 fused Ozaki kernel."""
    from ..core.batch import ozaki_v3_from_sources

    rows_flat = src.idx.reshape(-1).astype(jnp.int32)
    mask_flat = (
        None if src.mask2d is None
        else src.mask2d.reshape(-1).astype(jnp.float32)
    )
    # Static fold width from the idx SHAPE, not the ``lp`` field: when the
    # sources pytree crosses a jit boundary as an argument (diagnostics do
    # this; materialize_cv builds it inside the trace), the int leaf is
    # traced and a traced slice SIZE raises TracerIntegerConversionError.
    lp = src.idx.shape[1]

    def body(c, carry):
        rows = jax.lax.dynamic_slice_in_dim(
            rows_flat, c * (bs * lp), bs * lp, 0)
        mk = (
            None if mask_flat is None
            else jax.lax.dynamic_slice_in_dim(
                mask_flat, c * (bs * lp), bs * lp, 0)
        )
        sx = jax.lax.dynamic_slice_in_dim(src.sxv, c * bs, bs, 0)
        sc = jax.lax.dynamic_slice_in_dim(src.scal, c * bs, bs, 0)
        yv = jax.lax.dynamic_slice_in_dim(src.yvec, c * bs, bs, 0)
        return ozaki_v3_from_sources(
            config, src, rows, mk, sx, sc, yv, return_XTY=return_XTY,
        )

    buf0 = jnp.zeros((bs, 2, src.kp, src.cp), jnp.float32)
    buf = jax.lax.fori_loop(0, n_chunks, body, buf0)
    return buf.reshape(-1)[0]


# Module-level jit so repeat sweeps hit the compilation cache (a fresh jit
# wrapper per call would recompile the whole fori_loop program every time).
_materialize_sweep_jit = jax.jit(
    _materialize_sweep_impl, static_argnums=(0, 1, 2, 3, 4, 5, 6)
)


# Weight buffers that already passed the non-negativity fetch, keyed by
# object id with WEAK values: an entry dies with its buffer, so the map
# can never alias a new array that recycles a freed id (ids are unique
# among live objects), and it holds no device memory alive. jax.Array is
# unhashable (elementwise __eq__), hence id keys rather than a WeakSet.
_VALIDATED_WEIGHTS: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()


def _weights_validated(weights) -> bool:
    return _VALIDATED_WEIGHTS.get(id(weights)) is weights


def _remember_validated(weights) -> None:
    try:
        _VALIDATED_WEIGHTS[id(weights)] = weights
    except TypeError:  # non-weakrefable array flavor: just re-validate later
        pass


def materialize_cv(
    config: CVConfig,
    X,
    Y=None,
    weights=None,
    idx_batch=None,
    mask_batch=None,
    *,
    batch_size: Optional[int] = None,
    impl: str = "auto",
    return_XTX: bool = True,
    return_XTY: bool = True,
    hbm_budget_bytes: float = 4e9,
    validate: bool = True,
):
    """Fit + full fold sweep as ONE compiled program; returns a probe scalar.

    The total-CV throughput primitive (the reference's headline quantity:
    one fit plus every fold's training matrices,
    ``benchmarks/benchmark.py:148-152``). Beyond chaining the phases
    device-side, the fused program shares work between them: when the fold
    batch routes through the v3 Ozaki kernel, the dataset slice planes are
    built ONCE and consumed by BOTH the fit contraction
    (:func:`~cvmatrix_tpu.core.batch.contract_from_planes` — the fit
    products use exactly the same operand pair) and the per-fold downdate
    kernel, eliminating the duplicate slicing pass and the separate fit
    dispatch.

    Fetching the returned scalar is the completion barrier for the whole
    fit + sweep.
    """
    from ..utils.tracing import is_concrete

    # Pre-flight the weights contract (ref :1186-1189) BEFORE any device
    # work: the fused program runs fit(validate=False) under jit. NumPy
    # inputs are checked host-side for free; a committed jax array costs
    # one dependent-scalar fetch (the single-dispatch total-CV path is
    # ~0.15 s at P=1000, so an avoidable ~30 ms tunnel round trip counts)
    # — so a buffer that already passed is remembered and never re-fetched,
    # and callers owning the contract can skip entirely with
    # ``validate=False`` (mirroring :func:`~cvmatrix_tpu.core.fit.fit`).
    if validate and weights is not None:
        if not isinstance(weights, jax.Array):
            if np.any(np.asarray(weights) < 0):
                raise ValueError("Weights must be non-negative.")
        elif is_concrete(weights) and not _weights_validated(weights):
            if bool(jnp.any(weights < 0)):
                raise ValueError("Weights must be non-negative.")
            _remember_validated(weights)

    X = jnp.asarray(X, config.dtype)
    if X.ndim == 1:
        X = X.reshape(-1, 1)
    Yd = None if Y is None else jnp.asarray(Y, config.dtype)
    if Yd is not None and Yd.ndim == 1:
        Yd = Yd.reshape(-1, 1)
    wd = None if weights is None else jnp.asarray(weights, config.dtype)

    idx = jnp.asarray(idx_batch)
    mask = None if mask_batch is None else jnp.asarray(mask_batch, config.dtype)
    n_folds = idx.shape[0]
    dt = np.dtype(config.dtype)
    k = X.shape[1]
    m = (Yd.shape[1] if Yd is not None else 0) if return_XTY else 0
    if batch_size is None:
        c = (k if return_XTX else 0) + m
        per_fold = 2 * 8 * max(k * c, 1)
        batch_size = max(1, min(2000, int(hbm_budget_bytes / per_fold)))
    bs = min(batch_size, n_folds)
    n_chunks_eq = -(-n_folds // bs)
    bs = -(-n_folds // n_chunks_eq)
    on_tpu = jax.default_backend() == "tpu"
    use_pairs = impl != "xla" and on_tpu and dt.itemsize == 8
    use_f32_packed = impl != "xla" and on_tpu and dt.itemsize == 4
    if bs % 2 and (use_f32_packed or use_pairs):
        from ..core.batch import _df64x2_enabled, _f32x2_enabled

        if (use_f32_packed and _f32x2_enabled()) or (
                use_pairs and _df64x2_enabled()):
            bs += 1  # the two-folds-per-step kernels need an even chunk
    kernel_impl = "pallas" if (use_pairs or use_f32_packed) else impl

    idx, mask = _pad_folds(idx, mask, bs)
    n_chunks = idx.shape[0] // bs
    return _materialize_cv_jit(
        config, bs, n_chunks, return_XTX, return_XTY, kernel_impl,
        use_pairs or use_f32_packed, X, Yd, wd, idx, mask,
    )


def _materialize_cv_impl(
    config, bs, n_chunks, return_XTX, return_XTY, impl, use_packed,
    X, Y, w, idx, mask,
):
    import dataclasses

    from ..core.batch import (
        contract_from_planes,
        dataset_planes,
        large_fold_threshold,
        ozaki_v3_ok,
        prepare_ozaki_sources,
    )
    from ..core.fit import fit

    # Data/statistics fields first (products deferred) so the v3 route can
    # derive the products from the shared slice planes.
    pre = fit(config, X, Y, w, validate=False, products=(None, None))
    is_f64 = np.dtype(config.dtype).itemsize == 8
    n_l = idx.shape[1]
    share = (
        use_packed and is_f64 and mask is None and n_l > 1
        and n_l >= large_fold_threshold(config, pre, return_XTX, return_XTY)
        and ozaki_v3_ok(config, pre, return_XTX, return_XTY, n_l)
        and return_XTX and return_XTY and pre.M is not None
    )
    if share:
        planes = dataset_planes(config, pre, with_y=True, n_slices=10)
        prod = contract_from_planes(planes)
        k = pre.K
        m = pre.M
        state = dataclasses.replace(
            pre, XTX=prod[:k, :k], XTY=prod[:k, k:k + m],
        )
        n = n_chunks * bs
        src = prepare_ozaki_sources(
            config, state, idx[:n], None,
            return_XTX=return_XTX, return_XTY=return_XTY, planes=planes,
        )
        return _v3_sweep_loop(config, src, bs, n_chunks, return_XTY)

    # Fallback: the standard fit contraction, grafted onto the already-built
    # data/statistics fields (re-running fit() here would duplicate the
    # whole stats subgraph and lean on XLA CSE to clean it up).
    from ..ops.precise import contract

    if pre.Y is not None:
        prod = contract(pre.WX, jnp.concatenate([pre.X, pre.Y], axis=1),
                        mode=config.matmul_mode, symmetric_k=pre.K,
                        unweighted_x=w is None)
        state = dataclasses.replace(
            pre, XTX=prod[:, : pre.K], XTY=prod[:, pre.K:],
        )
    else:
        state = dataclasses.replace(
            pre,
            XTX=contract(pre.WX, pre.X, mode=config.matmul_mode,
                         symmetric_k=pre.K, unweighted_x=w is None),
        )
    return _materialize_sweep_impl(
        config, bs, n_chunks, return_XTX, return_XTY, impl, use_packed,
        state, idx, mask,
    )


_materialize_cv_jit = jax.jit(
    _materialize_cv_impl, static_argnums=(0, 1, 2, 3, 4, 5, 6)
)


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


# Routing-policy hooks: set_routing re-traces these programs (the kernel
# route is baked in at trace time).
_register_routing_cache(_cv_fold_fn)
_register_routing_cache(_reduce_sweep_jit)
_register_routing_cache(_reduce_sweep_jit_donated)
_register_routing_cache(_materialize_sweep_jit)
_register_routing_cache(_materialize_cv_jit)
