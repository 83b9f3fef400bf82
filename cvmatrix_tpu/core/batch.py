"""Batched per-fold training matrices with Pallas kernel backends.

This is the TPU fast path for fold batches: the cheap per-fold statistics
(gathers, downdated means/stds — reference ``cvmatrix/cvmatrix.py:632-752``)
run as vmapped XLA, while the O(F*K*C) epilogue (downdate + rank-one center +
outer-product scale, reference ``:943-1010``) runs in ONE fused HBM pass
through a Pallas kernel:

- float64 engine: :func:`~cvmatrix_tpu.ops.kernels.fused_downdate_df64` —
  double-float (f32 pair) arithmetic, ~2^-46-relative agreement with the f64
  reference (the 1e-8 contract with orders of magnitude of margin). XLA's
  own f64 emulation computes the same chain op-by-op at several times the
  flop count.
- float32 engine: :func:`~cvmatrix_tpu.ops.kernels.fused_downdate` — MXU
  downdate + f32 epilogue.

``impl="xla"`` (or any non-TPU backend / exotic config) falls back to the
reference-shaped vmapped engine in :mod:`cvmatrix_tpu.core.fold` — identical
semantics, different schedule.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CVConfig
from ..ops import kernels
from ..ops.df64 import df_from_f64, df_to_f64, split
from .fold import gather_val_blocks, _compute_training_stats, training_matrices
from .state import FitState

__all__ = ["training_matrices_batched"]


def _stat_flags(config: CVConfig, return_XTX: bool, return_XTY: bool):
    """Cross-coupled stat gating (reference ``cvmatrix.py:828-831``)."""
    return dict(
        return_X_mean=config.center_X or (return_XTY and config.center_Y),
        return_X_std=config.scale_X,
        return_Y_mean=return_XTY and (config.center_X or config.center_Y),
        return_Y_std=return_XTY and config.scale_Y,
    )


def _as_pair(x):
    """f64 (or f32) array -> (2, ...) stacked f32 pair."""
    if x.dtype == jnp.float64:
        hi, lo = df_from_f64(x)
    else:
        hi = x.astype(jnp.float32)
        lo = jnp.zeros_like(hi)
    return jnp.stack([hi, lo])


def _total4(total):
    """(K, C) f64 -> (4, K, C): hi, lo, split(hi) halves."""
    hi, lo = df_from_f64(total.astype(jnp.float64))
    hh, hl = split(hi)
    return jnp.stack([hi, lo, hh, hl])


def training_matrices_batched(
    config: CVConfig,
    state: FitState,
    idx_batch,
    mask_batch=None,
    *,
    return_XTX: bool = True,
    return_XTY: bool = True,
    impl: str = "auto",
    pair_output: bool = False,
    trim_output: bool = True,
):
    """Training matrices for a (F, L) batch of folds.

    Returns the same structure as ``vmap(training_matrices)``: matrices with
    a leading fold axis plus the stats 4-tuple. With ``pair_output=True``
    (f64 Pallas path only) matrices are returned as (F, 2, K, C) f32 hi/lo
    pairs — ``hi + lo`` is the f64 value — skipping the final pair->f64
    combine pass; downstream df64-aware consumers (and the throughput
    benchmark) use this to stay at one HBM pass per element.
    """
    if not return_XTX and not return_XTY:
        raise ValueError(
            "At least one of `return_XTX` and `return_XTY` must be True."
        )
    if return_XTY and state.Y is None:
        raise ValueError("Response variables `Y` are not provided.")

    idx = jnp.asarray(idx_batch)
    mask = None if mask_batch is None else jnp.asarray(mask_batch, config.dtype)
    dt = np.dtype(config.dtype)

    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and dt.itemsize in (4, 8):
            impl = "pallas"
        else:
            impl = "xla"

    if impl == "xla":
        fold_fn = lambda v, mk: training_matrices(  # noqa: E731
            config, state, v, mk,
            return_XTX=return_XTX, return_XTY=return_XTY,
        )
        in_axes = (0, None if mask is None else 0)
        out = jax.vmap(fold_fn, in_axes=in_axes)(idx, mask)
        if pair_output:
            raise ValueError("pair_output requires the f64 Pallas impl.")
        return out
    if impl != "pallas":
        raise ValueError(f"Unknown impl: {impl!r} (auto|pallas|xla).")

    flags = _stat_flags(config, return_XTX, return_XTY)

    def gather_and_stats(v, mk):
        blocks = gather_val_blocks(config, state, v, mk, return_XTY)
        stats5 = _compute_training_stats(
            config, state, blocks, check=False, **flags
        )
        return blocks, stats5

    blocks, stats5 = jax.vmap(
        gather_and_stats, in_axes=(0, None if mask is None else 0)
    )(idx, mask)
    X_mean, X_std, Y_mean, Y_std, sum_w_train = stats5
    stats = (X_mean, X_std, Y_mean, Y_std)

    # ---- factor-scaled kernel operands (all f64 -> f32 pairs) -------------
    # out = total (.) (r1 (x) r2) - sum_l (xv*r1) (x) (m2*r2) - p (x) q
    # with r = reciprocal stds (ones where that side is unscaled) and the
    # center term zeroed per side via q (XTX centers iff center_X; XTY iff
    # center_X or center_Y — reference :863,:893).
    f_folds, n_l = idx.shape
    k = state.K

    r1 = None
    if config.scale_X:
        r1 = 1.0 / X_std  # (F, 1, K)
    r2y = None
    if return_XTY and config.scale_Y:
        r2y = 1.0 / Y_std  # (F, 1, M)

    u = blocks.Xv_w if r1 is None else blocks.Xv_w * r1
    v_parts = []
    i2_parts = []
    if return_XTX:
        vx = blocks.Xv_u if r1 is None else blocks.Xv_u * r1
        v_parts.append(vx)
        i2_parts.append(
            jnp.ones((f_folds, 1, k), config.dtype) if r1 is None else r1
        )
    if return_XTY:
        vy = blocks.Yv_u if r2y is None else blocks.Yv_u * r2y
        v_parts.append(vy)
        i2_parts.append(
            jnp.ones((f_folds, 1, state.M), config.dtype) if r2y is None
            else r2y
        )
    v_rows = jnp.concatenate(v_parts, axis=2) if len(v_parts) > 1 else v_parts[0]

    center_xtx = config.center_X
    center_xty = config.center_X or config.center_Y
    center = (return_XTX and center_xtx) or (return_XTY and center_xty)
    scale = config.scale_X or (return_XTY and config.scale_Y)

    p_vec = q_vec = None
    if center:
        mX = X_mean[:, 0, :]  # (F, K)
        p_vec = sum_w_train[:, None] * mX
        if r1 is not None:
            p_vec = p_vec * r1[:, 0, :]
        q_parts = []
        if return_XTX:
            if center_xtx:
                qx = mX if r1 is None else mX * r1[:, 0, :]
            else:
                qx = jnp.zeros((f_folds, k), config.dtype)
            q_parts.append(qx)
        if return_XTY:
            if center_xty:
                mY = Y_mean[:, 0, :]
                qy = mY if r2y is None else mY * r2y[:, 0, :]
            else:
                qy = jnp.zeros((f_folds, state.M), config.dtype)
            q_parts.append(qy)
        q_vec = jnp.concatenate(q_parts, axis=1) if len(q_parts) > 1 else q_parts[0]

    total_parts = []
    if return_XTX:
        total_parts.append(state.XTX)
    if return_XTY:
        total_parts.append(state.XTY)
    total = (
        jnp.concatenate(total_parts, axis=1)
        if len(total_parts) > 1 else total_parts[0]
    )

    if dt.itemsize == 4:
        # f32 engine: MXU downdate kernel (reference operand form).
        m2 = []
        if return_XTX:
            m2.append(blocks.Xv_u)
        if return_XTY:
            m2.append(blocks.Yv_u)
        m2 = jnp.concatenate(m2, axis=2) if len(m2) > 1 else m2[0]
        a1 = mb = None
        if center:
            a1 = sum_w_train[:, None] * X_mean[:, 0, :]
            mb_parts = []
            if return_XTX:
                mb_parts.append(
                    X_mean[:, 0, :] if center_xtx
                    else jnp.zeros((f_folds, k), config.dtype)
                )
            if return_XTY:
                mb_parts.append(
                    Y_mean[:, 0, :] if center_xty
                    else jnp.zeros((f_folds, state.M), config.dtype)
                )
            mb = (
                jnp.concatenate(mb_parts, axis=1)
                if len(mb_parts) > 1 else mb_parts[0]
            )
        inv1 = inv2 = None
        if scale:
            inv1 = (
                1.0 / X_std[:, 0, :] if config.scale_X
                else jnp.ones((f_folds, k), config.dtype)
            )
            i2p = []
            if return_XTX:
                i2p.append(inv1)
            if return_XTY:
                i2p.append(
                    1.0 / Y_std[:, 0, :]
                    if config.scale_Y
                    else jnp.ones((f_folds, state.M), config.dtype)
                )
            inv2 = jnp.concatenate(i2p, axis=1) if len(i2p) > 1 else i2p[0]
        out = kernels.fused_downdate(
            total, blocks.Xv_w, m2, a1, mb, inv1, inv2,
            center=center, scale=scale,
        )
        out = out.astype(config.dtype)
    else:
        i1 = (
            r1[:, 0, :].astype(jnp.float64) if r1 is not None
            else jnp.ones((f_folds, k), jnp.float64)
        )
        i2 = jnp.concatenate(
            [pp[:, 0, :] for pp in i2_parts], axis=1
        ) if len(i2_parts) > 1 else i2_parts[0][:, 0, :]
        pair_out = kernels.fused_downdate_df64(
            _total4(total),
            _as_pair(u.astype(jnp.float64)),
            _as_pair(v_rows.astype(jnp.float64)),
            None if p_vec is None else _as_pair(p_vec.astype(jnp.float64)),
            None if q_vec is None else _as_pair(q_vec.astype(jnp.float64)),
            _as_pair(i1) if scale else None,
            _as_pair(i2) if scale else None,
            center=center,
            scale=scale,
            trim_output=trim_output or not pair_output,
        )
        if pair_output:
            if not trim_output:
                # Raw padded (F, 2, Kp, Cp) pairs, XTX|XTY unsplit: zero
                # post-kernel copies. The throughput path for padding-aware
                # consumers; columns [:K] are XTX, [K:K+C] are XTY.
                return pair_out, stats
            out = pair_out
        else:
            out = df_to_f64(pair_out[:, 0], pair_out[:, 1])

    if return_XTX and return_XTY:
        if pair_output and dt.itemsize == 8:
            mats = (out[:, :, :, :k], out[:, :, :, k:])
        else:
            mats = (out[:, :, :k], out[:, :, k:])
        return mats, stats
    return out, stats
