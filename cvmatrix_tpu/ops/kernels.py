"""Pallas TPU kernels: the fused downdate + center/scale epilogue.

The per-fold hot op (reference ``cvmatrix/cvmatrix.py:943-1010``) is

    out[f] = (total - Xv[f]^T @ M2[f] - a1[f] (x) m2[f]) * (inv1[f] (x) inv2[f])

for a batch of folds ``f``: a K x C downdate GEMM, a rank-one centering
correction, and an outer-product scale. Left to XLA this can become several
HBM passes over the (F, K, C) output; the Pallas kernel fuses all of it into
ONE pass: the ``total`` tile is fetched once (Mosaic revisiting keeps it
resident across folds), validation rows stream through VMEM, the epilogue
runs on registers, and each output element is written exactly once — the
roofline target of BASELINE.json.

The kernel is float32 (TPU Pallas has no f64); the float64 engine path keeps
using the XLA-fused elementwise-emulation route. Rank-one/center inputs are
pre-reduced per fold (cheap K-length math) by the caller; ``a1`` already
carries the ``sum_w_train`` factor and ``inv*`` are reciprocal stds.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precise import _T_BITS as _OZAKI_T_BITS
from .df64 import (
    df_add,
    df_mul,
    df_mul_presplit,
    df_recip,
    df_sqrt,
    df_sub,
    quick_two_sum,
    split,
    two_prod_presplit,
    two_sum,
)

__all__ = [
    "fused_downdate",
    "fused_downdate_df64",
    "fused_downdate_df64_packed",
    "fused_downdate_f32_packed",
    "fused_epilogue_df64",
    "fused_loocv_df64",
    "fused_loocv_df64_sym",
    "fused_loocv_df64x2",
    "fused_loocv_f32",
    "fused_loocv_f32x2",
    "fused_ozaki_downdate_df64",
    "fused_ozaki_downdate_v3",
    "fused_ozaki_downdate_v3_sym",
    "fused_smallfold_df64",
    "ozaki_trim_groups",
    "slice_rows",
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(total_ref, xv_ref, m2_ref, a1_ref, mb_ref, i1_ref, i2_ref,
            out_ref, acc_ref, *, center: bool, scale: bool, n_l: int):
    """Grid: (F, KT, CT, LT) — L innermost so the accumulator scratch sees
    all L-chunks of one (f, i, j) output tile consecutively."""
    l = pl.program_id(3)

    prod = jax.lax.dot_general(
        xv_ref[0],  # (BL, BK)
        m2_ref[0],  # (BL, BC)
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(l == 0)
    def _():
        acc_ref[:] = prod

    @pl.when(l > 0)
    def _():
        acc_ref[:] = acc_ref[:] + prod

    @pl.when(l == n_l - 1)
    def _():
        t = total_ref[:] - acc_ref[:]
        if center:
            t = t - a1_ref[0, 0][:, None] * mb_ref[0, 0][None, :]
        if scale:
            t = t * (i1_ref[0, 0][:, None] * i2_ref[0, 0][None, :])
        out_ref[0] = t


@functools.partial(
    jax.jit, static_argnames=("center", "scale", "block_k", "block_c",
                              "block_l", "interpret")
)
def fused_downdate(
    total: jax.Array,  # (K, C)
    xv: jax.Array,     # (F, L, K) weighted+masked validation rows
    m2: jax.Array,     # (F, L, C) unweighted second operand rows
    a1: Optional[jax.Array] = None,   # (F, K) = sum_w_train * mean1
    mb: Optional[jax.Array] = None,   # (F, C) = mean2
    inv1: Optional[jax.Array] = None,  # (F, K) = 1 / std1
    inv2: Optional[jax.Array] = None,  # (F, C) = 1 / std2
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
    block_l: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One-HBM-pass batched downdate; returns (F, K, C) float32.

    Shapes are padded to tile multiples internally (zero rows/columns in
    ``total``/``xv``/``m2``/``a1`` and ones in ``inv*`` keep padded outputs
    well-defined); the result is sliced back to (F, K, C).
    """
    f_folds, n_l_rows, k = xv.shape
    c = m2.shape[2]
    kp = _round_up(k, min(block_k, 128) if k > 8 else 8)
    kp = _round_up(kp, 128) if kp > 128 else _round_up(kp, 8)
    cp = _round_up(c, 128)
    lp = _round_up(n_l_rows, 8)
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    bl = min(block_l, lp)
    kp = _round_up(kp, bk)
    cp = _round_up(cp, bc)
    lp = _round_up(lp, bl)

    def pad(x, shape):
        return jnp.zeros(shape, jnp.float32).at[
            tuple(slice(0, s) for s in x.shape)
        ].set(x.astype(jnp.float32))

    total_p = pad(total, (kp, cp))
    xv_p = pad(xv, (f_folds, lp, kp))
    m2_p = pad(m2, (f_folds, lp, cp))
    if center:
        a1_p = pad(a1[:, None, :], (f_folds, 1, kp))
        mb_p = pad(mb[:, None, :], (f_folds, 1, cp))
    else:
        a1_p = jnp.zeros((f_folds, 1, kp), jnp.float32)
        mb_p = jnp.zeros((f_folds, 1, cp), jnp.float32)
    if scale:
        i1_p = jnp.ones((f_folds, 1, kp), jnp.float32).at[:, :, :k].set(
            inv1.astype(jnp.float32)[:, None, :]
        )
        i2_p = jnp.ones((f_folds, 1, cp), jnp.float32).at[:, :, :c].set(
            inv2.astype(jnp.float32)[:, None, :]
        )
    else:
        i1_p = jnp.ones((f_folds, 1, kp), jnp.float32)
        i2_p = jnp.ones((f_folds, 1, cp), jnp.float32)

    n_l = lp // bl
    grid = (f_folds, kp // bk, cp // bc, n_l)

    out = pl.pallas_call(
        functools.partial(_kernel, center=center, scale=scale, n_l=n_l),
        grid=grid,
        in_specs=[
            # total tile depends only on (i, j): Mosaic revisiting keeps it
            # in VMEM across the fold/L dimensions.
            pl.BlockSpec((bk, bc), lambda f, i, j, l: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl, bk), lambda f, i, j, l: (f, l, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl, bc), lambda f, i, j, l: (f, l, j),
                         memory_space=pltpu.VMEM),
            # f*0 (not a literal 0): Python ints trace as i64 under x64,
            # which Mosaic cannot legalize.
            pl.BlockSpec((1, 1, bk), lambda f, i, j, l: (f, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc), lambda f, i, j, l: (f, f * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda f, i, j, l: (f, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bc), lambda f, i, j, l: (f, f * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, bc), lambda f, i, j, l: (f, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_folds, kp, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bk, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * f_folds * lp * kp * cp + 4 * f_folds * kp * cp,
            bytes_accessed=(
                f_folds * kp * cp * 4 + kp * cp * 4
                + f_folds * lp * (kp + cp) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total_p, xv_p, m2_p, a1_p, mb_p, i1_p, i2_p)
    return out[:, :k, :c]


# --------------------------------------------------------------------------- #
# Double-float (f32 pair) fused downdate — the float64-grade roofline kernel  #
# --------------------------------------------------------------------------- #


def fused_downdate_df64(
    total4: jax.Array,  # (4, K, C): t_hi, t_lo, split(t_hi) hi/lo
    u: jax.Array,       # (2, F, L, K) pair: scaled weighted validation rows
    v: jax.Array,       # (2, F, L, C) pair: scaled second-operand rows
    p: Optional[jax.Array] = None,   # (2, F, K) pair: sw*mean1 (.) r1
    q: Optional[jax.Array] = None,   # (2, F, C) pair: mean2 (.) r2
    i1: Optional[jax.Array] = None,  # (2, F, K) pair: r1 = 1/std1
    i2: Optional[jax.Array] = None,  # (2, F, C) pair: r2 = 1/std2
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
    trim_output: bool = True,
) -> jax.Array:
    """Batched double-float downdate; returns (F, 2, K, C) f32 hi/lo pairs.

    Convenience wrapper over :func:`fused_downdate_df64_packed` for callers
    holding separate pair-major operands: pads/packs them into the kernel
    layout here. ``trim_output=False`` returns the padded (F, 2, Kp, Cp)
    result instead — slicing a multi-GB padded batch back to the exact
    shape costs a full HBM round-trip, which padding-aware consumers (the
    sweep drivers) skip.
    """
    if total4.shape[0] != 4:
        raise ValueError(
            "total4 must carry 4 planes (t_hi, t_lo, split(t_hi) hi/lo); "
            f"got {total4.shape[0]}. Zero-padding a 2-plane total would "
            "silently corrupt the scaled epilogue's Dekker split."
        )
    _, f_folds, n_l, k = u.shape
    c = v.shape[3]
    kp = _round_up(max(k, 8), 128)
    cp = _round_up(max(c, 8), 128)
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    kp = _round_up(kp, bk)
    cp = _round_up(cp, bc)

    def pad(x, shape):
        return jnp.zeros(shape, jnp.float32).at[
            tuple(slice(0, s) for s in x.shape)
        ].set(x)

    total_p = pad(total4, (4, kp, cp))
    u_p = pad(jnp.moveaxis(u, 0, 2), (f_folds, n_l, 2, kp))
    v_p = pad(jnp.moveaxis(v, 0, 2), (f_folds, n_l, 2, cp))
    kvec = jnp.zeros((f_folds, 2, 2, kp), jnp.float32).at[:, 1, 0, :].set(1.0)
    cvec = jnp.zeros((f_folds, 2, 2, cp), jnp.float32).at[:, 1, 0, :].set(1.0)
    if center:
        kvec = kvec.at[:, 0, :, :k].set(jnp.moveaxis(p, 0, 1))
        cvec = cvec.at[:, 0, :, :c].set(jnp.moveaxis(q, 0, 1))
    if scale:
        kvec = kvec.at[:, 1, :, :k].set(jnp.moveaxis(i1, 0, 1))
        cvec = cvec.at[:, 1, :, :c].set(jnp.moveaxis(i2, 0, 1))
    out = fused_downdate_df64_packed(
        total_p, u_p, v_p, kvec, cvec,
        center=center, scale=scale, block_k=bk, block_c=bc,
    )
    if trim_output:
        return out[:, :, :k, :c]
    return out


# --------------------------------------------------------------------------- #
# Packed-operand variant: zero per-call layout work                           #
# --------------------------------------------------------------------------- #


def _df64_kernel_packed(total_ref, u_ref, v_ref, kv_ref, cv_ref,
                        out_ref, acc_h, acc_l, *, center: bool, scale: bool,
                        n_l: int, presplit_total: bool):
    """Same math as :func:`fused_downdate_df64`, but the per-fold K-side vectors
    ride in one (1, 2, 2, bk) block [p, i1] and the C-side in (1, 2, 2, bc)
    [q, i2] — one HBM stream each instead of four."""
    l = pl.program_id(3)

    u_h = u_ref[0, 0, 0][:, None]
    u_lo = u_ref[0, 0, 1][:, None]
    v_h = v_ref[0, 0, 0][None, :]
    v_lo = v_ref[0, 0, 1][None, :]
    uhh, uhl = split(u_h)
    vhh, vhl = split(v_h)
    ph, pe = df_mul_presplit(u_h, u_lo, uhh, uhl, v_h, v_lo, vhh, vhl)

    @pl.when(l == 0)
    def _():
        acc_h[:] = ph
        acc_l[:] = pe

    @pl.when(l > 0)
    def _():
        s, e = two_sum(acc_h[:], ph)
        acc_h[:] = s
        acc_l[:] = acc_l[:] + (e + pe)

    @pl.when(l == n_l - 1)
    def _():
        pq = (
            (kv_ref[0, 0, 0][:, None], kv_ref[0, 0, 1][:, None],
             cv_ref[0, 0, 0][None, :], cv_ref[0, 0, 1][None, :])
            if center else None
        )
        i12 = (
            (kv_ref[0, 1, 0][:, None], kv_ref[0, 1, 1][:, None],
             cv_ref[0, 1, 0][None, :], cv_ref[0, 1, 1][None, :])
            if scale else None
        )
        oh, ol = _df64_tile_epilogue(
            total_ref, acc_h[:], acc_l[:], pq, i12,
            presplit_total=presplit_total,
        )
        out_ref[0, 0] = oh
        out_ref[0, 1] = ol


def _df64_tile_epilogue(total_ref, d_h, d_l, pq, i12, *, presplit_total):
    """Shared factor-form tile epilogue: ``total (.) (i1 (x) i2) - d - p (x) q``.

    ``pq``/``i12`` are ``(k_hi, k_lo, c_hi, c_lo)`` column/row vector pairs or
    ``None`` when centering/scaling is off. ``d_h``/``d_l`` is the accumulated
    (factor-scaled) downdate product pair.
    """
    if pq is not None:
        p_h, p_lo, q_h, q_lo = pq
        phh, phl = split(p_h)
        qhh, qhl = split(q_h)
        ch, ce = df_mul_presplit(p_h, p_lo, phh, phl, q_h, q_lo, qhh, qhl)
        s, e = two_sum(d_h, ch)
        d_h = s
        d_l = d_l + (e + ce)

    t_h = total_ref[0]
    t_lo = total_ref[1]
    if i12 is not None:
        if presplit_total:
            thh = total_ref[2]
            thl = total_ref[3]
        else:
            # huge-K mode: the total rides as 2 planes (half the HBM)
            # and its Dekker split costs 4 extra flops per element.
            thh, thl = split(t_h)
        i1_h, i1_lo, i2_h, i2_lo = i12
        i1hh, i1hl = split(i1_h)
        i2hh, i2hl = split(i2_h)
        # s = r1 (x) r2 first (vector splits amortise across the tile),
        # then one per-element product against the PRESPLIT total — one
        # fewer per-element Dekker split than total*r1 then *r2.
        s_h, s_e = df_mul_presplit(i1_h, i1_lo, i1hh, i1hl,
                                   i2_h, i2_lo, i2hh, i2hl)
        shh, shl = split(s_h)
        tsh, tse = two_prod_presplit(t_h, thh, thl, s_h, shh, shl)
        t_h_out = tsh
        t_l_out = tse + (t_h * s_e + t_lo * s_h)
    else:
        t_h_out = t_h
        t_l_out = t_lo

    oh, oe = two_sum(t_h_out, -d_h)
    return quick_two_sum(oh, oe + (t_l_out - d_l))


@functools.partial(
    jax.jit,
    static_argnames=("center", "scale", "block_k", "block_c", "interpret"),
)
def fused_downdate_df64_packed(
    total4: jax.Array,  # (4 or 2, Kp, Cp), already padded to tile multiples
    u: jax.Array,       # (F, L, 2, Kp) pair
    v: jax.Array,       # (F, L, 2, Cp) pair
    kvec: jax.Array,    # (F, 2, 2, Kp): [p, i1] pairs
    cvec: jax.Array,    # (F, 2, 2, Cp): [q, i2] pairs
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pre-padded, pre-packed double-float downdate -> (F, 2, Kp, Cp).

    The zero-copy entry point for sweep drivers: all layout work (padding,
    pair splitting, packing) happens ONCE per dataset in
    :func:`cvmatrix_tpu.core.batch.prepare_fold_operands`; per chunk the
    caller just slices the fold axis. Shapes must already satisfy the tile
    constraints (Kp, Cp multiples of the block sizes).
    """
    f_folds, n_l = u.shape[0], u.shape[1]
    n_planes, kp, cp = total4.shape
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    if kp % bk or cp % bc:
        raise ValueError(f"padded dims ({kp},{cp}) not multiples of "
                         f"({bk},{bc})")
    grid = (f_folds, kp // bk, cp // bc, n_l)
    out = pl.pallas_call(
        functools.partial(_df64_kernel_packed, center=center, scale=scale,
                          n_l=n_l, presplit_total=(n_planes == 4)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_planes, bk, bc), lambda f, i, j, l: (f * 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bk), lambda f, i, j, l: (f, l, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bc), lambda f, i, j, l: (f, l, f * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bk), lambda f, i, j, l: (f, f * 0, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bc), lambda f, i, j, l: (f, f * 0, f * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, bk, bc),
                               lambda f, i, j, l: (f, f * 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bk, bc), jnp.float32),
            pltpu.VMEM((bk, bc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=80 * f_folds * kp * cp * max(n_l, 1),
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 16
                + f_folds * n_l * (kp + cp) * 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total4, u, v, kvec, cvec)
    return out


# --------------------------------------------------------------------------- #
# Epilogue-only variant: downdate product precomputed (large folds)           #
# --------------------------------------------------------------------------- #


def _df64_ref_epilogue_math(total_ref, d_h, d_l, kv_ref, cv_ref, *,
                            center: bool, scale: bool):
    """Reference-form epilogue reading p/q/i1/i2 from packed kv/cv refs."""
    pq = i12 = None
    if center:
        pq = (kv_ref[0, 0, 0][:, None], kv_ref[0, 0, 1][:, None],
              cv_ref[0, 0, 0][None, :], cv_ref[0, 0, 1][None, :])
    if scale:
        i12 = (kv_ref[0, 1, 0][:, None], kv_ref[0, 1, 1][:, None],
               cv_ref[0, 1, 0][None, :], cv_ref[0, 1, 1][None, :])
    return _df64_ref_epilogue_vals(total_ref, d_h, d_l, pq, i12)


def _df64_ref_epilogue_vals(total_ref, d_h, d_l, pq, i12):
    """Reference-form epilogue on values: ``(total - d - p (x) q) (.) (i1 (x) i2)``.

    Note the center term sits INSIDE the scale here (reference form,
    ``cvmatrix/cvmatrix.py:1001-1009``) so p/q are the unscaled
    ``sum_w_train * mean1`` / ``mean2`` vectors — unlike the factor form of
    :func:`_df64_tile_epilogue`. ``pq``/``i12`` are
    ``(k_hi, k_lo, c_hi, c_lo)`` column/row vector tuples or ``None``.
    """
    if pq is not None:
        p_h, p_lo, q_h, q_lo = pq
        phh, phl = split(p_h)
        qhh, qhl = split(q_h)
        ch, ce = df_mul_presplit(p_h, p_lo, phh, phl, q_h, q_lo, qhh, qhl)
        s, e = two_sum(d_h, ch)
        d_h = s
        d_l = d_l + (e + ce)

    t_h = total_ref[0]
    t_lo = total_ref[1]
    # core = total - downdate (pre-scale)
    oh, oe = two_sum(t_h, -d_h)
    c_h, c_l = oh, oe + (t_lo - d_l)

    if i12 is not None:
        i1_h, i1_lo, i2_h, i2_lo = i12
        i1hh, i1hl = split(i1_h)
        i2hh, i2hl = split(i2_h)
        chh, chl = split(c_h)
        t2h, t2e = two_prod_presplit(c_h, chh, chl, i1_h, i1hh, i1hl)
        t2l = t2e + (c_h * i1_lo + c_l * i1_h)
        t2hh, t2hl = split(t2h)
        tsh, tse = two_prod_presplit(t2h, t2hh, t2hl, i2_h, i2hh, i2hl)
        c_h = tsh
        c_l = tse + (t2h * i2_lo + t2l * i2_h)

    return quick_two_sum(c_h, c_l)


def _df64_epilogue_kernel(total_ref, prod_ref, kv_ref, cv_ref,
                          out_ref, *, center: bool, scale: bool):
    """out = (total - prod - p (x) q) (.) (i1 (x) i2), all double-float.

    For folds with many validation rows the rank-L downdate product is far
    cheaper on the MXU (exact int8-slice contraction,
    :func:`cvmatrix_tpu.ops.precise.ozaki_contract`) than as an L-step VPU
    accumulation; this kernel then applies the remaining one-pass epilogue.
    The output block ALIASES the product block (identical index maps), so
    the read-block/compute/write-block order within one grid step is safe.
    """
    oh, ol = _df64_ref_epilogue_math(
        total_ref, prod_ref[0, 0], prod_ref[0, 1], kv_ref, cv_ref,
        center=center, scale=scale,
    )
    out_ref[0, 0] = oh
    out_ref[0, 1] = ol


@functools.partial(
    jax.jit,
    static_argnames=("center", "scale", "block_k", "block_c", "interpret"),
)
def fused_epilogue_df64(
    total_planes: jax.Array,  # (2, Kp, Cp) pair (padded)
    prod_pair: jax.Array,     # (F, 2, Kp, Cp) downdate-product (hi, lo)
    kvec: jax.Array,          # (F, 2, 2, Kp): [p, i1] pairs (unscaled p!)
    cvec: jax.Array,          # (F, 2, 2, Cp): [q, i2] pairs
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(total - prod - p (x) q) (.) (i1 (x) i2) -> (F, 2, Kp, Cp) pairs.

    The output ALIASES ``prod_pair``'s buffer (``input_output_aliases``):
    at genomics-wide K each (F, 2, Kp, Cp) buffer is >3 GB, and a separate
    output allocation was the peak-HBM straw that broke the K=20,000
    10-fold sweep (measured OOM by 50 MB of 15.75 GB on a v5e, 2026-08-20).
    The caller's ``stack(df_from_f64(prod64), axis=1)`` fuses into the
    buffer's producing pass, so the pair costs one materialisation total.
    """
    f_folds = prod_pair.shape[0]
    kp, cp = total_planes.shape[1], total_planes.shape[2]
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    if kp % bk or cp % bc:
        raise ValueError(f"padded dims ({kp},{cp}) not multiples of "
                         f"({bk},{bc})")
    grid = (f_folds, kp // bk, cp // bc)
    pair_spec = pl.BlockSpec((1, 2, bk, bc),
                             lambda f, i, j: (f, f * 0, i, j),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_df64_epilogue_kernel, center=center, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, bk, bc), lambda f, i, j: (f * 0, i, j),
                         memory_space=pltpu.VMEM),
            pair_spec,
            pl.BlockSpec((1, 2, 2, bk), lambda f, i, j: (f, f * 0, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bc), lambda f, i, j: (f, f * 0, f * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pair_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=90 * f_folds * kp * cp,
            bytes_accessed=f_folds * kp * cp * 16 + kp * cp * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(total_planes, prod_pair, kvec, cvec)


# --------------------------------------------------------------------------- #
# f32 packed variant: single-precision engine, same operand streams           #
# --------------------------------------------------------------------------- #


def _f32_kernel_packed(total_ref, u_ref, v_ref, kv_ref, cv_ref, out_ref,
                       acc_ref, *, center: bool, scale: bool, n_l: int):
    """Single-precision factor-scaled downdate on the packed operand layout.

    Reads only the hi planes of the (pair-shaped) operands; ~6 VPU flops per
    output element, so the sweep is HBM-write-bound. Same math shape as
    :func:`_df64_kernel_packed` minus the double-word bookkeeping.
    """
    l = pl.program_id(3)

    prod = u_ref[0, 0, 0][:, None] * v_ref[0, 0, 0][None, :]

    @pl.when(l == 0)
    def _():
        acc_ref[:] = prod

    @pl.when(l > 0)
    def _():
        acc_ref[:] = acc_ref[:] + prod

    @pl.when(l == n_l - 1)
    def _():
        d = acc_ref[:]
        if center:
            d = d + kv_ref[0, 0, 0][:, None] * cv_ref[0, 0, 0][None, :]
        t = total_ref[0]
        if scale:
            t = t * (kv_ref[0, 1, 0][:, None] * cv_ref[0, 1, 0][None, :])
        out_ref[0] = t - d


@functools.partial(
    jax.jit,
    static_argnames=("center", "scale", "block_k", "block_c", "interpret"),
)
def fused_downdate_f32_packed(
    total_planes: jax.Array,  # (>=1, Kp, Cp); plane 0 used
    u: jax.Array,             # (F, L, 2, Kp); hi plane used
    v: jax.Array,             # (F, L, 2, Cp)
    kvec: jax.Array,          # (F, 2, 2, Kp): [p, i1]
    cvec: jax.Array,          # (F, 2, 2, Cp): [q, i2]
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Packed f32 downdate -> (F, Kp, Cp) float32 (padded)."""
    f_folds, n_l = u.shape[0], u.shape[1]
    kp, cp = total_planes.shape[1], total_planes.shape[2]
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    if kp % bk or cp % bc:
        raise ValueError(f"padded dims ({kp},{cp}) not multiples of "
                         f"({bk},{bc})")
    grid = (f_folds, kp // bk, cp // bc, n_l)
    return pl.pallas_call(
        functools.partial(_f32_kernel_packed, center=center, scale=scale,
                          n_l=n_l),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk, bc), lambda f, i, j, l: (f * 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bk), lambda f, i, j, l: (f, l, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, bc), lambda f, i, j, l: (f, l, f * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bk), lambda f, i, j, l: (f, f * 0, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bc), lambda f, i, j, l: (f, f * 0, f * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, bc), lambda f, i, j, l: (f, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_folds, kp, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bk, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * f_folds * kp * cp * max(n_l, 1),
            # output + total + the per-fold u/v row streams (the dominant
            # input term at large L, same accounting as the df64 sibling)
            bytes_accessed=(f_folds * kp * cp * 4 + kp * cp * 4
                            + f_folds * max(n_l, 1) * (kp + cp) * 2 * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total_planes, u, v, kvec, cvec)


# --------------------------------------------------------------------------- #
# LOOCV all-in-one kernel: gather + stats + downdate + epilogue, one pass     #
# --------------------------------------------------------------------------- #


def _df64_side_stats_from_sums(sum_rows, sq_rows, g, sw, rsw, rdv,
                               need_mean, need_std, *, resolution):
    """Downdated mean and clamped reciprocal std for one side, double-float.

    ``sum_rows``/``sq_rows``: pair sums of the fold's (weighted) validation
    rows and their squares; ``g``: (4, Kp) global [sum, sum_sq] pairs. The
    same formulas as :func:`cvmatrix_tpu.core.fold._train_std` (reference
    ``cvmatrix/cvmatrix.py:1081-1129``).
    """
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    m = r = None
    if need_mean or need_std:
        st = df_sub(g[0:1, :], g[1:2, :], *sum_rows)   # sum_train pair
        m = df_mul(st[0], st[1], *rsw)                 # mean = sum * rsw
    if need_std:
        ss = df_sub(g[2:3, :], g[3:4, :], *sq_rows)
        t1 = df_mul(m[0], m[1], st[0], st[1])
        t1 = (-2.0 * t1[0], -2.0 * t1[1])              # exact scale by -2
        m2 = df_mul(m[0], m[1], m[0], m[1])
        t2 = df_mul(m2[0], m2[1], *sw)
        v = df_add(*df_add(*t1, *t2), *ss)
        v = df_mul(v[0], v[1], *rdv)
        sd = df_sqrt(v[0], v[1])                       # var <= 0 -> 0
        clamp = sd[0] <= jnp.float32(resolution)
        rr = df_recip(sd[0], sd[1])
        r = (jnp.where(clamp, one, rr[0]), jnp.where(clamp, zero, rr[1]))
    return m, r


def _loocv_vectors(xw_h, xw_l, xu_h, xu_l, yu_h, yu_l, yw_h, yw_l,
                   gx, gy, ymask, scal_row, *, center_xtx: bool,
                   center_xty: bool, scale_x: bool, scale_y: bool,
                   with_y: bool, resolution: float):
    """The vector phase of one LOOCV fold: stats + factor-form operands.

    Returns ``(u, v, pq, i12)``: the downdate factor pairs ``u`` (K side)
    and ``v`` (concatenated [X | Y] side) as ``(hi, lo)`` tuples of
    (1, Kp)/(1, Cp) arrays, and the centering/scaling vector 4-tuples
    ``(p_h, p_l, q_h, q_l)`` / ``(i1_h, i1_l, i2_h, i2_l)`` (or None when
    the flags are off). The tile phase consumes (slices of) these.
    """
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    sw = (scal_row[0], scal_row[1])
    rsw = (scal_row[2], scal_row[3])
    rdv = (scal_row[4], scal_row[5])

    center = center_xtx or (with_y and center_xty)
    scale = scale_x or (with_y and scale_y)
    need_x_mean = center or scale_x
    need_y_mean = with_y and (center_xty or scale_y)

    def side_stats(w_h, w_l, u_h, u_l, g, need_mean, need_std):
        """Stats from one validation row (sq row = w-row (.) u-row)."""
        sq = df_mul(w_h, w_l, u_h, u_l) if need_std else (None, None)
        return _df64_side_stats_from_sums(
            (w_h, w_l), sq, g, sw, rsw, rdv, need_mean, need_std,
            resolution=resolution,
        )

    mX, r1 = side_stats(xw_h, xw_l, xu_h, xu_l, gx, need_x_mean, scale_x)
    if with_y:
        mY, r2 = side_stats(yw_h, yw_l, yu_h, yu_l, gy, need_y_mean,
                            with_y and scale_y)

    # ---- factor-form operand vectors ------------------------------------- #
    u = df_mul(xw_h, xw_l, *r1) if scale_x else (xw_h, xw_l)
    vx = df_mul(xu_h, xu_l, *r1) if scale_x else (xu_h, xu_l)
    if with_y:
        vy = df_mul(yu_h, yu_l, *r2) if scale_y else (yu_h, yu_l)
        # Y operands are zero outside the Y columns and X operands zero at
        # columns >= K, so the concatenated row is a plain pair addition.
        v = df_add(*vx, *vy)
    else:
        v = vx

    pq = None
    if center:
        mXr = df_mul(mX[0], mX[1], *r1) if scale_x else mX
        p = df_mul(mXr[0], mXr[1], *sw)
        if center_xtx:
            qx = mXr
        else:
            qx = (jnp.zeros_like(mXr[0]), jnp.zeros_like(mXr[1]))
        if with_y and center_xty:
            qy = df_mul(mY[0], mY[1], *r2) if scale_y else mY
            q = df_add(*qx, *qy)
        else:
            q = qx
        pq = (p[0], p[1], q[0], q[1])

    i12 = None
    if scale:
        i1 = r1 if scale_x else (jnp.ones_like(xw_h), jnp.zeros_like(xw_h))
        ri2y = r2 if (with_y and scale_y) else i1
        i2 = (jnp.where(ymask > 0, ri2y[0], i1[0]),
              jnp.where(ymask > 0, ri2y[1], i1[1]))
        i12 = (i1[0], i1[1], i2[0], i2[1])

    return u, v, pq, i12


def _loocv_fold_math(total, xw_h, xw_l, xu_h, xu_l, yu_h, yu_l, yw_h, yw_l,
                     gx, gy, ymask, scal_row, *, center_xtx: bool,
                     center_xty: bool, scale_x: bool, scale_y: bool,
                     with_y: bool, presplit_total: bool, resolution: float):
    """One LOOCV fold's full math on plain (1, Kp) f32 arrays.

    Shared between the Pallas kernel (ref loads around it) and the eager
    reference implementation used by the CPU tests — Pallas interpret mode
    executes f32 chains with FMA/excess precision on CPU (measured: ``a*b+c``
    matches the f64-fused result), which silently breaks double-float
    compensation; eager per-op execution is faithfully rounded, and the real
    TPU VPU has no FMA at all (probed), so hardware matches this math.
    """
    u, v, pq_vec, i12_vec = _loocv_vectors(
        xw_h, xw_l, xu_h, xu_l, yu_h, yu_l, yw_h, yw_l,
        gx, gy, ymask, scal_row,
        center_xtx=center_xtx, center_xty=center_xty,
        scale_x=scale_x, scale_y=scale_y, with_y=with_y,
        resolution=resolution,
    )
    pq = None if pq_vec is None else (
        pq_vec[0][0][:, None], pq_vec[1][0][:, None],
        pq_vec[2][0][None, :], pq_vec[3][0][None, :],
    )
    i12 = None if i12_vec is None else (
        i12_vec[0][0][:, None], i12_vec[1][0][:, None],
        i12_vec[2][0][None, :], i12_vec[3][0][None, :],
    )

    uhh, uhl = split(u[0][0][:, None])
    vhh, vhl = split(v[0][0][None, :])
    d_h, d_l = df_mul_presplit(
        u[0][0][:, None], u[1][0][:, None], uhh, uhl,
        v[0][0][None, :], v[1][0][None, :], vhh, vhl,
    )
    return _df64_tile_epilogue(total, d_h, d_l, pq, i12,
                               presplit_total=presplit_total)


def _df64_loocv_kernel(idx_ref, total_ref, xw_ref, xu_ref, yu_ref, yw_ref,
                       gx_ref, gy_ref, ymask_ref, scal_ref, out_ref, *,
                       with_y: bool, **flags):
    """Pallas wrapper: ref loads around :func:`_loocv_fold_math`."""
    if with_y:
        yu_h, yu_l = yu_ref[0, 0:1, :], yu_ref[0, 1:2, :]
        yw_h, yw_l = yw_ref[0, 0:1, :], yw_ref[0, 1:2, :]
    else:
        yu_h = yu_l = yw_h = yw_l = None
    oh, ol = _loocv_fold_math(
        total_ref,
        xw_ref[0, 0:1, :], xw_ref[0, 1:2, :],
        xu_ref[0, 0:1, :], xu_ref[0, 1:2, :],
        yu_h, yu_l, yw_h, yw_l,
        gx_ref[:], gy_ref[:], ymask_ref[0:1, :], scal_ref[0, 0],
        with_y=with_y, **flags,
    )
    out_ref[0, 0] = oh
    out_ref[0, 1] = ol


def fused_loocv_df64_reference(
    idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal, *,
    center_xtx, center_xty, scale_x, scale_y, with_y, resolution,
):
    """Eager reference of :func:`fused_loocv_df64` (same math, no Pallas).

    Runs op-by-op (do NOT jit it): eager execution keeps every f32 op
    correctly rounded, making this the faithful CPU model of the TPU kernel
    for tests. Returns (F, 2, Kp, Cp) pairs.
    """
    n_planes = total4.shape[0]
    outs = []
    for f in range(int(idx.shape[0])):
        r = int(idx[f])
        oh, ol = _loocv_fold_math(
            total4,
            xw[r, 0:1, :], xw[r, 1:2, :],
            xu[r, 0:1, :], xu[r, 1:2, :],
            (yu[r, 0:1, :] if with_y else None),
            (yu[r, 1:2, :] if with_y else None),
            (yw[r, 0:1, :] if with_y else None),
            (yw[r, 1:2, :] if with_y else None),
            gx, gy, ymask[0:1, :], scal[f, 0],
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            presplit_total=(n_planes == 4), resolution=resolution,
        )
        outs.append(jnp.stack([oh, ol]))
    return jnp.stack(outs)


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret"),
)
def fused_loocv_df64(
    idx: jax.Array,     # (F,) int32 validation row index per fold
    total4: jax.Array,  # (4 or 2, KP, CP) total pair planes, KP == CP
    xw: jax.Array,      # (N, 2, KP) weighted X row pairs (or X if unweighted)
    xu: jax.Array,      # (N, 2, KP) unweighted X row pairs (may alias xw)
    yu: jax.Array,      # (N, 2, CP) Y pairs SHIFTED to columns [K, K+M)
    yw: jax.Array,      # (N, 2, CP) weighted-Y pairs shifted (may alias yu)
    gx: jax.Array,      # (4, KP): sum_X pair, sum_sq_X pair (zeros if unused)
    gy: jax.Array,      # (4, CP): shifted sum_Y pair, sum_sq_Y pair
    ymask: jax.Array,   # (1, CP) f32: 1.0 on Y columns
    scal: jax.Array,    # (F, 1, 128) f32 per-fold scalar pairs
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """All-in-one LOOCV downdate -> (F, 2, KP, CP) double-float pairs.

    See :func:`_df64_loocv_kernel`. Requires KP == CP (single concatenated
    tile) and one validation row per fold; the general small-fold path
    (:func:`fused_downdate_df64_packed`) covers everything else.
    """
    f_folds = idx.shape[0]
    n_planes, kp, cp = total4.shape
    if kp != cp:
        raise ValueError(f"fused_loocv_df64 requires KP == CP, got ({kp},{cp})")
    # f * 0 (not a literal 0): Python ints trace as i64 under x64, which
    # Mosaic cannot legalize in index maps.
    row = lambda f, idx_ref: (idx_ref[f], f * 0, f * 0)  # noqa: E731
    const3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    const2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds,),
        in_specs=[
            pl.BlockSpec((n_planes, kp, cp), const3),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, cp), row if with_y else const3),
            pl.BlockSpec((1, 2, cp), row if with_y else const3),
            pl.BlockSpec((4, kp), const2),
            pl.BlockSpec((4, cp), const2),
            pl.BlockSpec((1, cp), const2),
            pl.BlockSpec((1, 1, 128), lambda f, idx_ref: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f, idx_ref: (f, f * 0, f * 0, f * 0)),
    )
    scale = scale_x or (with_y and scale_y)
    return pl.pallas_call(
        functools.partial(
            _df64_loocv_kernel,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            presplit_total=(n_planes == 4), resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(34 + (17 if (center_xtx or center_xty) else 0)
                   + (32 if scale else 0)) * f_folds * kp * cp,
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 4 * n_planes
                + f_folds * (4 * kp + 2 * cp) * 4 * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal)


def _df64_loocv2_kernel(idx_ref, total_ref, xw0_ref, xu0_ref, yu0_ref,
                        yw0_ref, xw1_ref, xu1_ref, yu1_ref, yw1_ref,
                        gx_ref, gy_ref, ymask_ref, scal_ref, out_ref, *,
                        with_y: bool, **flags):
    """Two folds per grid step (df64 sibling of :func:`_f32_loocv2_kernel`):
    amortises the per-step grid fixed cost across two folds. Same math as
    :func:`_df64_loocv_kernel` — the body is shared."""
    for sub, (xw_r, xu_r, yu_r, yw_r) in enumerate(
        ((xw0_ref, xu0_ref, yu0_ref, yw0_ref),
         (xw1_ref, xu1_ref, yu1_ref, yw1_ref))
    ):
        if with_y:
            yu_h, yu_l = yu_r[0, 0:1, :], yu_r[0, 1:2, :]
            yw_h, yw_l = yw_r[0, 0:1, :], yw_r[0, 1:2, :]
        else:
            yu_h = yu_l = yw_h = yw_l = None
        oh, ol = _loocv_fold_math(
            total_ref,
            xw_r[0, 0:1, :], xw_r[0, 1:2, :],
            xu_r[0, 0:1, :], xu_r[0, 1:2, :],
            yu_h, yu_l, yw_h, yw_l,
            gx_ref[:], gy_ref[:], ymask_ref[0:1, :], scal_ref[sub, 0],
            with_y=with_y, **flags,
        )
        out_ref[sub, 0] = oh
        out_ref[sub, 1] = ol


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret"),
)
def fused_loocv_df64x2(
    idx: jax.Array,     # (F,) int32, F EVEN: two folds per grid step
    total4: jax.Array,  # (4 or 2, KP, CP) total pair planes, KP == CP
    xw: jax.Array,
    xu: jax.Array,
    yu: jax.Array,
    yw: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    ymask: jax.Array,
    scal: jax.Array,    # (F, 1, 128)
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """Two-folds-per-step sibling of :func:`fused_loocv_df64`.

    Identical math and (F, 2, KP, CP) output; the (F/2,) grid halves the
    per-step fixed cost. Worth it only if the TTTT fold loop is partly
    step-overhead-bound rather than purely VPU-issue-bound — the A/B knob
    ``CVMATRIX_TPU_DF64X2`` exists to measure exactly that. ``F`` must be
    even (sweep chunk sizes are bumped even when the knob is on).
    """
    f_folds = idx.shape[0]
    if f_folds % 2:
        raise ValueError(f"fused_loocv_df64x2 needs an even fold count, "
                         f"got {f_folds}")
    n_planes, kp, cp = total4.shape
    if kp != cp:
        raise ValueError(f"requires KP == CP, got ({kp},{cp})")
    rowA = lambda f, idx_ref: (idx_ref[2 * f], f * 0, f * 0)  # noqa: E731
    rowB = lambda f, idx_ref: (idx_ref[2 * f + 1], f * 0, f * 0)  # noqa: E731
    c3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    c2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds // 2,),
        in_specs=[
            pl.BlockSpec((n_planes, kp, cp), c3),
            pl.BlockSpec((1, 2, kp), rowA),
            pl.BlockSpec((1, 2, kp), rowA),
            pl.BlockSpec((1, 2, cp), rowA if with_y else c3),
            pl.BlockSpec((1, 2, cp), rowA if with_y else c3),
            pl.BlockSpec((1, 2, kp), rowB),
            pl.BlockSpec((1, 2, kp), rowB),
            pl.BlockSpec((1, 2, cp), rowB if with_y else c3),
            pl.BlockSpec((1, 2, cp), rowB if with_y else c3),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((4, cp), c2),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((2, 1, 128),
                         lambda f, idx_ref: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((2, 2, kp, cp),
                               lambda f, idx_ref: (f, f * 0, f * 0, f * 0)),
    )
    scale = scale_x or (with_y and scale_y)
    return pl.pallas_call(
        functools.partial(
            _df64_loocv2_kernel,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            presplit_total=(n_planes == 4), resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(34 + (17 if (center_xtx or center_xty) else 0)
                   + (32 if scale else 0)) * f_folds * kp * cp,
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 4 * n_planes
                + f_folds * (4 * kp + 2 * cp) * 4 * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, xw, xu, yu, yw, gx, gy, ymask, scal)


# --------------------------------------------------------------------------- #
# Symmetric-mirror LOOCV kernel: compute upper tiles, transpose the mirrors   #
# --------------------------------------------------------------------------- #
# Every fold's XTX block is symmetric (ref ``cvmatrix/cvmatrix.py:1001-1009``
# with mat2 = the unweighted twin of the gathered row), so the strictly-
# lower output tiles equal the transposes of their upper partners up to the
# factor-form rounding asymmetry (~2^-46 relative — the reference's own
# output carries the same-order asymmetry from its operand ordering). The
# TTTT epilogue is VPU-issue-bound at ~80 flops/element; mirroring the
# strict-lower tiles replaces that arithmetic with one in-VMEM transpose.

_SYM_TILE = 256


def _df64_loocv_sym_kernel(idx_ref, total_ref, xw_ref, xu_ref, yu_ref,
                           yw_ref, gx_ref, gy_ref, ymask_ref, scal_ref,
                           out_ref, *, bt: int, n_planes: int, with_y: bool,
                           center_xtx: bool, center_xty: bool, scale_x: bool,
                           scale_y: bool, resolution: float):
    """One fold per grid step (same grid as the full kernel); the tile loop
    is a STATIC Python loop inside the body, so mirroring costs no extra
    grid steps, scratch, or dynamic control flow."""
    center = center_xtx or (with_y and center_xty)
    scale = scale_x or (with_y and scale_y)
    if with_y:
        yu_h, yu_l = yu_ref[0, 0:1, :], yu_ref[0, 1:2, :]
        yw_h, yw_l = yw_ref[0, 0:1, :], yw_ref[0, 1:2, :]
    else:
        yu_h = yu_l = yw_h = yw_l = None
    u, v, pq_vec, i12_vec = _loocv_vectors(
        xw_ref[0, 0:1, :], xw_ref[0, 1:2, :],
        xu_ref[0, 0:1, :], xu_ref[0, 1:2, :],
        yu_h, yu_l, yw_h, yw_l,
        gx_ref[:], gy_ref[:], ymask_ref[0:1, :], scal_ref[0, 0],
        center_xtx=center_xtx, center_xty=center_xty,
        scale_x=scale_x, scale_y=scale_y, with_y=with_y,
        resolution=resolution,
    )
    kp = total_ref.shape[1]
    n_t = kp // bt
    # Vector-wide Dekker splits once per fold (amortised over all tiles).
    uhh, uhl = split(u[0])
    vhh, vhl = split(v[0])

    # Mosaic cannot broadcast lane-offset slices of COMPUTED vectors (the
    # (1, kp) values above live in registers; a [j*bt:(j+1)*bt] slice keeps
    # lane offset j*bt in its layout, and vector.broadcast rejects offsets
    # >= the 128-lane tile — probed on the real lowering, 2026-08-18).
    # Reshaping once per fold to (n_t, bt) makes every tile piece a
    # sublane row at lane offset 0, which lowers cleanly.
    def r2(vec):
        return vec.reshape(n_t, bt)

    u0, u1, uhh, uhl = r2(u[0]), r2(u[1]), r2(uhh), r2(uhl)
    v0, v1, vhh, vhl = r2(v[0]), r2(v[1]), r2(vhh), r2(vhl)
    pq2 = None if pq_vec is None else tuple(r2(p) for p in pq_vec)
    i122 = None if i12_vec is None else tuple(r2(p) for p in i12_vec)

    def colpc(vec, r):
        return vec[r, :][:, None]

    def rowpc(vec, c):
        return vec[c:c + 1, :]

    for i in range(n_t):
        for j in range(i, n_t):
            d_h, d_l = df_mul_presplit(
                colpc(u0, i), colpc(u1, i), colpc(uhh, i), colpc(uhl, i),
                rowpc(v0, j), rowpc(v1, j), rowpc(vhh, j), rowpc(vhl, j),
            )
            pq = None
            if center:
                pq = (colpc(pq2[0], i), colpc(pq2[1], i),
                      rowpc(pq2[2], j), rowpc(pq2[3], j))
            i12 = None
            if scale:
                i12 = (colpc(i122[0], i), colpc(i122[1], i),
                       rowpc(i122[2], j), rowpc(i122[3], j))
            tt = [
                total_ref[p, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt]
                for p in range(n_planes)
            ]
            oh, ol = _df64_tile_epilogue(tt, d_h, d_l, pq, i12,
                                         presplit_total=(n_planes == 4))
            out_ref[0, 0, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = oh
            out_ref[0, 1, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = ol
            if j > i:
                out_ref[0, 0, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                    jnp.transpose(oh)
                )
                out_ref[0, 1, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                    jnp.transpose(ol)
                )


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret", "bt"),
)
def fused_loocv_df64_sym(
    idx: jax.Array,     # (F,) int32 validation row index per fold
    total4: jax.Array,  # (4 or 2, KP, CP) total pair planes, KP == CP
    xw: jax.Array,      # (N, 2, KP)
    xu: jax.Array,      # (N, 2, KP)
    yu: jax.Array,      # (N, 2, CP) shifted to columns [K, K+M)
    yw: jax.Array,      # (N, 2, CP)
    gx: jax.Array,      # (4, KP)
    gy: jax.Array,      # (4, CP)
    ymask: jax.Array,   # (1, CP)
    scal: jax.Array,    # (F, 1, 128)
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    bt: int = _SYM_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Symmetry-exploiting sibling of :func:`fused_loocv_df64`.

    Same operands, same grid (one fold per step), same (F, 2, KP, CP)
    output; the body loops over ``bt x bt`` tiles statically, computing
    only ``i <= j`` and writing strictly-lower tiles as in-register
    transposes of their upper partners — at KP = 512 / 2 tiles per side
    that removes 1/4 of the VPU epilogue work on the flop-bound all-flags
    path. Mirrored entries differ from direct computation by the ~2^-46
    factor-form rounding asymmetry (the output becomes exactly symmetric
    in the X block; Y columns land in padding rows of the mirrors — see
    the module comment above).

    Requires KP == CP, KP a multiple of ``bt``, and at least 2 tiles per
    side (use :func:`fused_loocv_df64` otherwise).
    """
    f_folds = idx.shape[0]
    n_planes, kp, cp = total4.shape
    if kp != cp or kp % bt or kp // bt < 2:
        raise ValueError(
            f"sym kernel needs KP == CP, KP % {bt} == 0, >= 2 tiles; "
            f"got ({kp}, {cp})"
        )
    n_t = kp // bt
    # f * 0: Python int literals trace as i64 under x64 (Mosaic can't
    # legalize them in index maps).
    row = lambda f, idx_ref: (idx_ref[f], f * 0, f * 0)  # noqa: E731
    const3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    const2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds,),
        in_specs=[
            pl.BlockSpec((n_planes, kp, cp), const3),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, cp), row if with_y else const3),
            pl.BlockSpec((1, 2, cp), row if with_y else const3),
            pl.BlockSpec((4, kp), const2),
            pl.BlockSpec((4, cp), const2),
            pl.BlockSpec((1, cp), const2),
            pl.BlockSpec((1, 1, 128), lambda f, idx_ref: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f, idx_ref: (f, f * 0, f * 0, f * 0)),
    )
    scale = scale_x or (with_y and scale_y)
    n_upper = n_t * (n_t + 1) // 2
    return pl.pallas_call(
        functools.partial(
            _df64_loocv_sym_kernel, bt=bt, n_planes=n_planes,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(34 + (17 if (center_xtx or center_xty) else 0)
                   + (32 if scale else 0)) * f_folds * bt * bt * n_upper,
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 4 * n_planes
                + f_folds * (4 * kp + 2 * cp) * 4 * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal)


def fused_loocv_df64_sym_reference(
    idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal, *,
    center_xtx, center_xty, scale_x, scale_y, with_y, resolution,
    bt: int = _SYM_TILE,
):
    """Eager reference of :func:`fused_loocv_df64_sym` (no Pallas).

    The computed tiles are bit-identical to :func:`fused_loocv_df64_reference`
    (slicing commutes with every elementwise op in the chain); strictly-
    lower tiles are transposes of their partners.
    """
    full = fused_loocv_df64_reference(
        idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal,
        center_xtx=center_xtx, center_xty=center_xty,
        scale_x=scale_x, scale_y=scale_y, with_y=with_y,
        resolution=resolution,
    )
    kp = total4.shape[1]
    n_t = kp // bt
    out = np.array(full)
    for i in range(n_t):
        for j in range(i + 1, n_t):
            out[:, :, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                np.swapaxes(
                    out[:, :, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt],
                    2, 3,
                )
            )
    return jnp.asarray(out)


# --------------------------------------------------------------------------- #
# Fused Ozaki downdate: int8 slice matmuls + recombination + epilogue         #
# --------------------------------------------------------------------------- #


def _ozaki_downdate_kernel(total_ref, sa_ref, sb_ref, pa_ref, pb_ref,
                           kv_ref, cv_ref, out_ref, *, center: bool,
                           scale: bool, n_slices: int, exact_groups: bool):
    """One fold's exact downdate product AND epilogue, entirely on-chip.

    The Ozaki-scheme contraction (see :mod:`cvmatrix_tpu.ops.precise`) runs
    its int8 x int8 -> int32 slice products on the MXU *inside* the kernel
    and recombines the same-exponent groups into a double-float pair on the
    VPU — the (F, Kp, Cp) product never round-trips HBM, which the separate
    contract-then-epilogue pipeline pays twice for. With ``exact_groups``
    (group sums < 2^24, true for folds up to ~400 rows) each int32 group sum
    converts to a SINGLE exact f32 — no pair conversion at all.

    ``pa``/``pb`` carry each side's per-column scale ``2^e`` as TWO exact
    power-of-two f32 factors (their product can exceed the f32 range, so
    they multiply the accumulator sequentially — every step exact).
    """
    s_groups = n_slices
    acc_h = None
    acc_l = None
    for s in range(s_groups):
        d32 = jax.lax.dot_general(
            sa_ref[0, 0], sb_ref[0, s],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        for i in range(1, s + 1):
            d32 = d32 + jax.lax.dot_general(
                sa_ref[0, i], sb_ref[0, s - i],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        cs = 2.0 ** (-float(_OZAKI_T_BITS) * (s + 2))
        g_h = d32.astype(jnp.float32)
        if exact_groups:
            g_l = None
        else:
            g_l = (d32 - g_h.astype(jnp.int32)).astype(jnp.float32)
        if acc_h is None:
            acc_h = g_h * cs
            acc_l = jnp.zeros_like(g_h) if g_l is None else g_l * cs
        else:
            t, e = two_sum(acc_h, g_h * cs)
            acc_h = t
            acc_l = acc_l + (e if g_l is None else e + g_l * cs)

    # Column scales 2^(ea + eb): four sequential exact power-of-two
    # factors, interleaved A/B so a huge exponent on one side can cancel a
    # tiny one on the other before the f32 intermediate overflows.
    pa1 = pa_ref[0, 0][:, None]
    pa2 = pa_ref[0, 1][:, None]
    pb1 = pb_ref[0, 0][None, :]
    pb2 = pb_ref[0, 1][None, :]
    d_h = acc_h * pa1 * pb1 * pa2 * pb2
    d_l = acc_l * pa1 * pb1 * pa2 * pb2

    oh, ol = _df64_ref_epilogue_math(total_ref, d_h, d_l, kv_ref, cv_ref,
                                     center=center, scale=scale)
    out_ref[0, 0] = oh
    out_ref[0, 1] = ol


@functools.partial(
    jax.jit,
    static_argnames=("center", "scale", "interpret"),
)
def fused_ozaki_downdate_df64(
    total_planes: jax.Array,  # (2, KP, CP) total pair planes
    sa: jax.Array,            # (F, S, Lp, KP) int8 mantissa slices, A side
    sb: jax.Array,            # (F, S, Lp, CP) int8 mantissa slices, B side
    pa: jax.Array,            # (F, 2, KP) f32 exact 2^e half-factors, A side
    pb: jax.Array,            # (F, 2, CP) f32 half-factors, B side
    kvec: jax.Array,          # (F, 2, 2, KP): [p, i1] pairs (unscaled p)
    cvec: jax.Array,          # (F, 2, 2, CP): [q, i2] pairs
    *,
    center: bool,
    scale: bool,
    interpret: bool = False,
) -> jax.Array:
    """Large-fold downdate + epilogue -> (F, 2, KP, CP) double-float pairs.

    Replaces [vmapped ozaki_contract -> pair split -> fused_epilogue_df64]
    with ONE kernel per fold batch. Requires a single square tile
    (KP == CP); the caller falls back to the split pipeline otherwise.
    """
    f_folds, n_slices, lp, kp = sa.shape
    cp = sb.shape[3]
    if kp != cp:
        raise ValueError(f"requires KP == CP, got ({kp},{cp})")
    # int32 group sums are exact below 2^31; below 2^24 they are even exact
    # in a single f32 (slice values are (T_BITS+1)-bit integers, so a group
    # sum is bounded by n * Lp * 2^(2 T_BITS)).
    bound = n_slices * lp * (1 << (2 * _OZAKI_T_BITS))
    if bound >= 2 ** 31:
        raise ValueError("fold rows too large for exact int32 group sums")
    exact_groups = bound < 2 ** 24
    c3 = lambda f: (f * 0, f * 0, f * 0)  # noqa: E731
    grid = (f_folds,)
    return pl.pallas_call(
        functools.partial(
            _ozaki_downdate_kernel, center=center, scale=scale,
            n_slices=n_slices, exact_groups=exact_groups,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, kp, cp), c3),
            pl.BlockSpec((1, n_slices, lp, kp),
                         lambda f: (f, f * 0, f * 0, f * 0)),
            pl.BlockSpec((1, n_slices, lp, cp),
                         lambda f: (f, f * 0, f * 0, f * 0)),
            pl.BlockSpec((1, 2, kp), lambda f: (f, f * 0, f * 0)),
            pl.BlockSpec((1, 2, cp), lambda f: (f, f * 0, f * 0)),
            pl.BlockSpec((1, 2, 2, kp), lambda f: (f, f * 0, f * 0, f * 0)),
            pl.BlockSpec((1, 2, 2, cp), lambda f: (f, f * 0, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f: (f, f * 0, f * 0, f * 0)),
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(
                f_folds * kp * cp
                * (n_slices * (n_slices + 1) * lp  # int8 MACs
                   + 10 * n_slices + 50)           # recombine + epilogue
            ),
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 8
                + f_folds * n_slices * lp * (kp + cp)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total_planes, sa, sb, pa, pb, kvec, cvec)


# --------------------------------------------------------------------------- #
# Small-fold all-in-one kernel: L validation rows, gather + stats + epilogue  #
# --------------------------------------------------------------------------- #


def _smallfold_row_terms(xw, xu, yu, yw, m, *, with_y, scale_x, scale_y,
                         need_x_mean, need_y_mean):
    """One validation row's contributions (pair tuples of (1, Kp) vectors).

    Returns ``(prod, xwm, sqx, ywm, sqy)``: the unscaled downdate product
    pair for this row (reference operand form — the row mask multiplies only
    the weighted side, ``cvmatrix/cvmatrix.py:898-941`` semantics), the
    masked weighted row, and the squared-row terms for the std sums. Unused
    terms come back ``None``.
    """
    if m is None:
        xwm = xw
    else:
        xwm = (xw[0] * m, xw[1] * m)
    v = df_add(*xu, *yu) if with_y else xu
    uhh, uhl = split(xwm[0][0][:, None])
    vhh, vhl = split(v[0][0][None, :])
    prod = df_mul_presplit(
        xwm[0][0][:, None], xwm[1][0][:, None], uhh, uhl,
        v[0][0][None, :], v[1][0][None, :], vhh, vhl,
    )
    sqx = df_mul(*xwm, *xu) if scale_x else None
    ywm = sqy = None
    if with_y and (need_y_mean or scale_y):
        if m is None:
            ywm = yw
        else:
            ywm = (yw[0] * m, yw[1] * m)
        if scale_y:
            sqy = df_mul(*ywm, *yu)
    return prod, (xwm if need_x_mean or scale_x else None), sqx, ywm, sqy


def _smallfold_finalize(total_ref, acc, sk, sc, gx, gy, ymask, scal_row, *,
                        center_xtx, center_xty, scale_x, scale_y, with_y,
                        resolution):
    """Stats from accumulated row sums, then the reference-form epilogue.

    ``acc``: accumulated product pair; ``sk``: (4, Kp) [sum xwm, sum sqx]
    pairs; ``sc``: (4, Cp) [sum ywm, sum sqy] pairs (Y-side, shifted
    layout).
    """
    sw = (scal_row[0], scal_row[1])
    rsw = (scal_row[2], scal_row[3])
    rdv = (scal_row[4], scal_row[5])
    center = center_xtx or (with_y and center_xty)
    scale = scale_x or (with_y and scale_y)
    need_x_mean = center or scale_x
    need_y_mean = with_y and (center_xty or scale_y)

    mX = r1 = mY = r2 = None
    if need_x_mean or scale_x:
        mX, r1 = _df64_side_stats_from_sums(
            (sk[0:1, :], sk[1:2, :]), (sk[2:3, :], sk[3:4, :]), gx,
            sw, rsw, rdv, need_x_mean, scale_x, resolution=resolution,
        )
    if need_y_mean or (with_y and scale_y):
        mY, r2 = _df64_side_stats_from_sums(
            (sc[0:1, :], sc[1:2, :]), (sc[2:3, :], sc[3:4, :]), gy,
            sw, rsw, rdv, need_y_mean, with_y and scale_y,
            resolution=resolution,
        )

    pq = None
    if center:
        p = df_mul(mX[0], mX[1], *sw)
        qx = mX if center_xtx else (jnp.zeros_like(mX[0]),
                                    jnp.zeros_like(mX[1]))
        if with_y and center_xty:
            q = df_add(*qx, *mY)
        else:
            q = qx
        pq = (p[0][0][:, None], p[1][0][:, None],
              q[0][0][None, :], q[1][0][None, :])

    i12 = None
    if scale:
        zeros = jnp.zeros_like(gx[0:1, :])
        i1 = r1 if scale_x else (jnp.ones_like(gx[0:1, :]), zeros)
        ri2y = r2 if (with_y and scale_y) else i1
        i2 = (jnp.where(ymask > 0, ri2y[0], i1[0]),
              jnp.where(ymask > 0, ri2y[1], i1[1]))
        i12 = (i1[0][0][:, None], i1[1][0][:, None],
               i2[0][0][None, :], i2[1][0][None, :])

    return _df64_ref_epilogue_vals(total_ref, acc[0], acc[1], pq, i12)


def _smallfold_kernel(idx_ref, total_ref, xw_ref, xu_ref, yu_ref, yw_ref,
                      gx_ref, gy_ref, ymask_ref, scal_ref, mrow_ref,
                      out_ref, acc_h, acc_l, sk_ref, sc_ref, *,
                      n_l: int, has_mask: bool, with_y: bool, **flags):
    """Grid (F, L): each step folds one gathered validation row into VMEM
    scratch; the last row finalises stats and writes the fold's matrices."""
    l = pl.program_id(1)

    xw = (xw_ref[0, 0:1, :], xw_ref[0, 1:2, :])
    xu = (xu_ref[0, 0:1, :], xu_ref[0, 1:2, :])
    if with_y:
        yu = (yu_ref[0, 0:1, :], yu_ref[0, 1:2, :])
        yw = (yw_ref[0, 0:1, :], yw_ref[0, 1:2, :])
    else:
        yu = yw = (None, None)
    m = mrow_ref[0, 0, 0, 0] if has_mask else None

    center = flags["center_xtx"] or (with_y and flags["center_xty"])
    need_x_mean = center or flags["scale_x"]
    need_y_mean = with_y and (flags["center_xty"] or flags["scale_y"])
    prod, xwm, sqx, ywm, sqy = _smallfold_row_terms(
        xw, xu, yu, yw, m, with_y=with_y, scale_x=flags["scale_x"],
        scale_y=flags["scale_y"], need_x_mean=need_x_mean,
        need_y_mean=need_y_mean,
    )

    zk = jnp.zeros_like(xw[0])

    @pl.when(l == 0)
    def _():
        acc_h[:] = prod[0]
        acc_l[:] = prod[1]
        sk_ref[0:1, :] = xwm[0] if xwm is not None else zk
        sk_ref[1:2, :] = xwm[1] if xwm is not None else zk
        sk_ref[2:3, :] = sqx[0] if sqx is not None else zk
        sk_ref[3:4, :] = sqx[1] if sqx is not None else zk
        if with_y:
            zc = jnp.zeros_like(yu[0])
            sc_ref[0:1, :] = ywm[0] if ywm is not None else zc
            sc_ref[1:2, :] = ywm[1] if ywm is not None else zc
            sc_ref[2:3, :] = sqy[0] if sqy is not None else zc
            sc_ref[3:4, :] = sqy[1] if sqy is not None else zc

    @pl.when(l > 0)
    def _():
        s, e = two_sum(acc_h[:], prod[0])
        acc_h[:] = s
        acc_l[:] = acc_l[:] + (e + prod[1])

        def acc_pair(ref, row0, pair):
            if pair is None:
                return
            s, e = two_sum(ref[row0:row0 + 1, :], pair[0])
            ref[row0 + 1:row0 + 2, :] = (
                ref[row0 + 1:row0 + 2, :] + (e + pair[1])
            )
            ref[row0:row0 + 1, :] = s

        acc_pair(sk_ref, 0, xwm)
        acc_pair(sk_ref, 2, sqx)
        if with_y:
            acc_pair(sc_ref, 0, ywm)
            acc_pair(sc_ref, 2, sqy)

    @pl.when(l == n_l - 1)
    def _():
        oh, ol = _smallfold_finalize(
            total_ref, (acc_h[:], acc_l[:]), sk_ref[:], sc_ref[:],
            gx_ref[:], gy_ref[:], ymask_ref[0:1, :], scal_ref[0, 0],
            with_y=with_y, resolution=flags["resolution"],
            center_xtx=flags["center_xtx"], center_xty=flags["center_xty"],
            scale_x=flags["scale_x"], scale_y=flags["scale_y"],
        )
        out_ref[0, 0] = oh
        out_ref[0, 1] = ol


@functools.partial(
    jax.jit,
    static_argnames=("n_l", "center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "has_mask", "resolution", "interpret"),
)
def fused_smallfold_df64(
    idx: jax.Array,     # (F * L,) int32: row indices, fold-major
    total4: jax.Array,  # (>=2, KP, CP) total pair planes, KP == CP
    xw: jax.Array,      # (N, 2, KP) weighted X row pairs
    xu: jax.Array,      # (N, 2, KP) unweighted X row pairs (may alias xw)
    yu: jax.Array,      # (N, 2, CP) Y pairs shifted to columns [K, K+M)
    yw: jax.Array,      # (N, 2, CP) weighted-Y pairs shifted (may alias yu)
    gx: jax.Array,      # (4, KP) global [sum_X, sum_sq_X] pairs
    gy: jax.Array,      # (4, CP) shifted [sum_Y, sum_sq_Y] pairs
    ymask: jax.Array,   # (1, CP) f32: 1.0 on Y columns
    scal: jax.Array,    # (F, 1, 128) f32 per-fold scalar pairs
    mrow: jax.Array,    # (F, L, 1, 128) f32 row masks at [..., 0] (dummy ok)
    *,
    n_l: int,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    has_mask: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """General small-fold all-in-one downdate -> (F, 2, KP, CP) pairs.

    The L > 1 sibling of :func:`fused_loocv_df64`: rows stream through a
    (F, L) grid, products and stat sums accumulate in VMEM scratch, and the
    reference-form epilogue runs once per fold. Supports padded fold batches
    via per-row masks (mask multiplies only the weighted side, matching
    ``gather_val_blocks``).

    Measured on a v5e (N=100k, K=500, f64, TTTT): ~13% SLOWER than the
    hoisted-prep packed kernel at L=4-10 — the reference-form epilogue's
    two sequential per-element double-float multiplies cost more than the
    operand-prep passes it eliminates — so the sweep drivers do NOT route
    through it by default; it remains available for memory-constrained
    callers (no per-fold operand streams) and as the masked-batch variant
    of the all-in-one design.
    """
    if idx.shape[0] % n_l:
        raise ValueError(
            f"flat index count {idx.shape[0]} is not a multiple of the "
            f"fold size {n_l} — a floor-divided fold count would silently "
            "drop trailing rows"
        )
    f_folds = idx.shape[0] // n_l
    n_planes, kp, cp = total4.shape
    if kp != cp:
        raise ValueError(f"requires KP == CP, got ({kp},{cp})")
    row = lambda f, l, idx_ref: (idx_ref[f * n_l + l], f * 0, f * 0)  # noqa: E731
    c3 = lambda f, l, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    c2 = lambda f, l, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds, n_l),
        in_specs=[
            pl.BlockSpec((2, kp, cp), c3),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, cp), row if with_y else c3),
            pl.BlockSpec((1, 2, cp), row if with_y else c3),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((4, cp), c2),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((1, 1, 128), lambda f, l, idx_ref: (f, f * 0, f * 0)),
            pl.BlockSpec(
                (1, 1, 1, 128),
                (lambda f, l, idx_ref: (f, l, f * 0, f * 0)) if has_mask
                else (lambda f, l, idx_ref: (f * 0, f * 0, f * 0, f * 0)),
            ),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f, l, idx_ref: (f, f * 0, f * 0, f * 0)),
        scratch_shapes=[
            pltpu.VMEM((kp, cp), jnp.float32),
            pltpu.VMEM((kp, cp), jnp.float32),
            pltpu.VMEM((4, kp), jnp.float32),
            pltpu.VMEM((4, cp), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _smallfold_kernel, n_l=n_l, has_mask=has_mask, with_y=with_y,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(21 * n_l + 60) * f_folds * kp * cp,
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 8
                + f_folds * n_l * (kp + cp) * 16
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal, mrow)


def fused_smallfold_df64_reference(
    idx2d, mask2d, total4, xw, xu, yu, yw, gx, gy, ymask, scal, *,
    center_xtx, center_xty, scale_x, scale_y, with_y, resolution,
):
    """Eager reference of :func:`fused_smallfold_df64` (same math helpers).

    Do NOT jit: eager per-op rounding is the faithful CPU model of the TPU
    kernel (see :func:`fused_loocv_df64_reference`).
    """
    f_folds, n_l = idx2d.shape
    center = center_xtx or (with_y and center_xty)
    need_x_mean = center or scale_x
    need_y_mean = with_y and (center_xty or scale_y)
    outs = []
    for f in range(int(f_folds)):
        acc = sk = sc = None
        for l in range(n_l):
            r = int(idx2d[f, l])
            xwp = (xw[r, 0:1, :], xw[r, 1:2, :])
            xup = (xu[r, 0:1, :], xu[r, 1:2, :])
            yup = ((yu[r, 0:1, :], yu[r, 1:2, :]) if with_y else (None, None))
            ywp = ((yw[r, 0:1, :], yw[r, 1:2, :]) if with_y else (None, None))
            m = None if mask2d is None else jnp.float32(mask2d[f, l])
            prod, xwm, sqx, ywm, sqy = _smallfold_row_terms(
                xwp, xup, yup, ywp, m, with_y=with_y, scale_x=scale_x,
                scale_y=scale_y, need_x_mean=need_x_mean,
                need_y_mean=need_y_mean,
            )
            zk = jnp.zeros_like(xwp[0])
            zc = jnp.zeros_like(yup[0]) if with_y else None
            row_sk = [p if p is not None else (zk, zk)
                      for p in (xwm, sqx)]
            row_sc = [p if p is not None else (zc, zc)
                      for p in (ywm, sqy)] if with_y else None
            if l == 0:
                acc = prod
                sk = row_sk
                sc = row_sc
            else:
                s, e = two_sum(acc[0], prod[0])
                acc = (s, acc[1] + (e + prod[1]))

                def add(a, b):
                    if b[0] is None:
                        return a
                    s, e = two_sum(a[0], b[0])
                    return (s, a[1] + (e + b[1]))

                sk = [add(a, b) for a, b in zip(sk, row_sk)]
                if with_y:
                    sc = [add(a, b) for a, b in zip(sc, row_sc)]
        sk_mat = jnp.concatenate(
            [sk[0][0], sk[0][1], sk[1][0], sk[1][1]], axis=0)
        if with_y:
            sc_mat = jnp.concatenate(
                [sc[0][0], sc[0][1], sc[1][0], sc[1][1]], axis=0)
        else:
            sc_mat = gy
        oh, ol = _smallfold_finalize(
            total4, acc, sk_mat, sc_mat, gx, gy, ymask[0:1, :], scal[f, 0],
            with_y=with_y, resolution=resolution, center_xtx=center_xtx,
            center_xty=center_xty, scale_x=scale_x, scale_y=scale_y,
        )
        outs.append(jnp.stack([oh, ol]))
    return jnp.stack(outs)


# --------------------------------------------------------------------------- #
# f32-engine all-in-one LOOCV kernel                                          #
# --------------------------------------------------------------------------- #


def _f32_loocv_kernel(idx_ref, total_ref, xw_ref, xu_ref, yu_ref, yw_ref,
                      gx_ref, gy_ref, ymask_ref, scal_ref, out_ref,
                      **flags):
    """Single-precision sibling of :func:`_df64_loocv_kernel`.

    Reads only the hi planes of the pair-layout sources; statistics and the
    factor-form epilogue run in plain f32 (~8 flops/element — the sweep is
    HBM-store-bound). Same operand semantics, same single-tile geometry.
    Body shared with the two-folds-per-step variant
    (:func:`_f32_loocv2_kernel`).
    """
    _f32_loocv_body(total_ref, xw_ref, xu_ref, yu_ref, yw_ref, gx_ref,
                    gy_ref, ymask_ref, scal_ref[0, 0], out_ref, 0, **flags)


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret"),
)
def fused_loocv_f32(
    idx: jax.Array,     # (F,) int32 validation row index per fold
    total4: jax.Array,  # (>=1, KP, CP); plane 0 used
    xw: jax.Array,      # (N, 2, KP) pair layout; hi plane used
    xu: jax.Array,      # (N, 2, KP)
    yu: jax.Array,      # (N, 2, CP) shifted to columns [K, K+M)
    yw: jax.Array,      # (N, 2, CP)
    gx: jax.Array,      # (4, KP): rows 0/2 = sum_X, sum_sq_X (f32)
    gy: jax.Array,      # (4, CP) shifted
    ymask: jax.Array,   # (1, CP)
    scal: jax.Array,    # (F, 1, 128): cols 0/2/4 = sw, 1/sw, 1/divisor
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """f32 all-in-one LOOCV downdate -> (F, KP, CP) float32."""
    f_folds = idx.shape[0]
    n_planes, kp, cp = total4.shape
    if kp != cp:
        raise ValueError(f"fused_loocv_f32 requires KP == CP, got ({kp},{cp})")
    row = lambda f, idx_ref: (idx_ref[f], f * 0, f * 0)  # noqa: E731
    c3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    c2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds,),
        in_specs=[
            # plane 0 only: the f32 body never reads the pair/presplit
            # planes, so staging them would double the VMEM block.
            pl.BlockSpec((1, kp, cp), c3),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, kp), row),
            pl.BlockSpec((1, 2, cp), row if with_y else c3),
            pl.BlockSpec((1, 2, cp), row if with_y else c3),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((4, cp), c2),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((1, 1, 128), lambda f, idx_ref: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, kp, cp),
                               lambda f, idx_ref: (f, f * 0, f * 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _f32_loocv_kernel,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * f_folds * kp * cp,
            bytes_accessed=f_folds * kp * cp * 4 + kp * cp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, gx, gy, ymask, scal)


def _f32_loocv2_kernel(idx_ref, total_ref, xw0_ref, xu0_ref, yu0_ref,
                       yw0_ref, xw1_ref, xu1_ref, yu1_ref, yw1_ref,
                       gx_ref, gy_ref, ymask_ref, scal_ref, out_ref,
                       **flags):
    """Two folds per grid step: amortises the per-step grid overhead that
    dominates the gap between the f32 sweep (~3.0 us/fold measured) and
    its ~2.1 us store+flop floor."""
    for sub, (xw_r, xu_r, yu_r, yw_r) in enumerate(
        ((xw0_ref, xu0_ref, yu0_ref, yw0_ref),
         (xw1_ref, xu1_ref, yu1_ref, yw1_ref))
    ):
        _f32_loocv_body(
            total_ref, xw_r, xu_r, yu_r, yw_r, gx_ref, gy_ref, ymask_ref,
            scal_ref[sub, 0], out_ref, sub, **flags,
        )


def _f32_loocv_body(total_ref, xw_ref, xu_ref, yu_ref, yw_ref, gx_ref,
                    gy_ref, ymask_ref, scal_row, out_ref, out_row, *,
                    center_xtx: bool, center_xty: bool, scale_x: bool,
                    scale_y: bool, with_y: bool, resolution: float):
    """One fold's f32 math (shared between the 1- and 2-fold kernels)."""
    one = jnp.float32(1.0)
    xw = xw_ref[0, 0:1, :]
    xu = xu_ref[0, 0:1, :]
    sw = scal_row[0]
    rsw = scal_row[2]
    rdv = scal_row[4]

    center = center_xtx or (with_y and center_xty)
    scale = scale_x or (with_y and scale_y)
    need_x_mean = center or scale_x
    need_y_mean = with_y and (center_xty or scale_y)

    def side_stats(w_row, u_row, g, need_mean, need_std):
        m = r = None
        if need_mean or need_std:
            st = g[0:1, :] - w_row
            m = st * rsw
        if need_std:
            ss = g[2:3, :] - w_row * u_row
            var = (-2.0 * m * st + sw * m * m + ss) * rdv
            sd = jnp.sqrt(jnp.maximum(var, 0.0))
            r = jnp.where(sd <= jnp.float32(resolution), one, 1.0 / sd)
        return m, r

    mX, r1 = side_stats(xw, xu, gx_ref[:], need_x_mean, scale_x)
    if with_y:
        yu = yu_ref[0, 0:1, :]
        yw = yw_ref[0, 0:1, :]
        mY, r2 = side_stats(yw, yu, gy_ref[:], need_y_mean,
                            with_y and scale_y)

    u = xw * r1 if scale_x else xw
    vx = xu * r1 if scale_x else xu
    if with_y:
        vy = yu * r2 if scale_y else yu
        v = vx + vy  # disjoint column support
    else:
        v = vx

    d = u[0][:, None] * v[0][None, :]
    if center:
        mXr = mX * r1 if scale_x else mX
        p = mXr * sw
        qx = mXr if center_xtx else jnp.zeros_like(mXr)
        if with_y and center_xty:
            q = qx + (mY * r2 if scale_y else mY)
        else:
            q = qx
        d = d + p[0][:, None] * q[0][None, :]
    t = total_ref[0]
    if scale:
        i1 = r1 if scale_x else jnp.ones_like(xw)
        ym = ymask_ref[0:1, :]
        ri2y = r2 if (with_y and scale_y) else i1
        i2 = jnp.where(ym > 0, ri2y, i1)
        t = t * (i1[0][:, None] * i2[0][None, :])
    out_ref[out_row] = t - d


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret"),
)
def fused_loocv_f32x2(
    idx: jax.Array,     # (F,) int32, F EVEN: two folds per grid step
    total4: jax.Array,  # (>=1, KP, CP); plane 0 used
    xw: jax.Array,
    xu: jax.Array,
    yu: jax.Array,
    yw: jax.Array,
    gx: jax.Array,
    gy: jax.Array,
    ymask: jax.Array,
    scal: jax.Array,    # (F, 1, 128)
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """Two-folds-per-step sibling of :func:`fused_loocv_f32`.

    Identical math and output; the (F/2,) grid halves the per-step fixed
    cost. ``F`` must be even (sweep chunk sizes are).
    """
    f_folds = idx.shape[0]
    if f_folds % 2:
        raise ValueError(f"fused_loocv_f32x2 needs an even fold count, "
                         f"got {f_folds}")
    n_planes, kp, cp = total4.shape
    if kp != cp:
        raise ValueError(f"requires KP == CP, got ({kp},{cp})")
    rowA = lambda f, idx_ref: (idx_ref[2 * f], f * 0, f * 0)  # noqa: E731
    rowB = lambda f, idx_ref: (idx_ref[2 * f + 1], f * 0, f * 0)  # noqa: E731
    c3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    c2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f_folds // 2,),
        in_specs=[
            # plane 0 only: the shared f32 body never reads further planes.
            pl.BlockSpec((1, kp, cp), c3),
            pl.BlockSpec((1, 2, kp), rowA),
            pl.BlockSpec((1, 2, kp), rowA),
            pl.BlockSpec((1, 2, cp), rowA if with_y else c3),
            pl.BlockSpec((1, 2, cp), rowA if with_y else c3),
            pl.BlockSpec((1, 2, kp), rowB),
            pl.BlockSpec((1, 2, kp), rowB),
            pl.BlockSpec((1, 2, cp), rowB if with_y else c3),
            pl.BlockSpec((1, 2, cp), rowB if with_y else c3),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((4, cp), c2),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((2, 1, 128),
                         lambda f, idx_ref: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((2, kp, cp),
                               lambda f, idx_ref: (f, f * 0, f * 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _f32_loocv2_kernel,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_folds, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * f_folds * kp * cp,
            bytes_accessed=f_folds * kp * cp * 4 + kp * cp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx, total4, xw, xu, yu, yw, xw, xu, yu, yw, gx, gy, ymask, scal)


# --------------------------------------------------------------------------- #
# Fused Ozaki v3: pre-gathered slice stacks, prefix-stack MXU products        #
# --------------------------------------------------------------------------- #

# Recombination chain split: groups below this index accumulate through
# exact two_sum steps; later groups (magnitude <= (s+1) Lp 2^-6s <= Lp 2^-28
# of the column-scale product for s >= 5) are plain-added and merged with
# ONE final two_sum. The plain adds round at 2^-24 of the tail's own
# magnitude — <= Sp * Lp * 2^-54 of the scale, far below the trim budget —
# for ~25 fewer VPU flops per output element than an all-two_sum chain.
_V3_TAIL_START = 5


# Trim budget default lives in cvmatrix_tpu.policy (in-process A/B via
# set_routing; env var CVMATRIX_TPU_OZAKI_BUDGET_LOG2 is a debug
# override). Default -31 since the 2026-08-18 v5e A/B (fold phase -28% at
# P=1000, -6% at P=10000; see RoutingPolicy): it sheds one product group
# at both mid-band brackets (Lp=128 and Lp=32 at bench N) while the
# trimmed tail stays >= 1 decade inside the reference's 1e-8 contract at
# bench scale (~5e-10 of the column-scale product); -36 gives ~2 decades
# of headroom for callers who want it.


def ozaki_trim_groups(n_l: int, *, n_slices: int = 10,
                      budget_log2: Optional[int] = None) -> int:
    """Number of slice-product groups needed for a fold of ``n_l`` rows.

    Group ``s`` of the Ozaki contraction is bounded by
    ``(s+1) * Lp * 2^(-T_BITS * s)`` relative to the per-column scale
    product ``pa (x) pb``, so the tail dropped by keeping ``Sp`` groups is
    under ``1.2 * (Sp+1) * Lp * 2^(-T_BITS * Sp)``. The default budget
    (``policy().ozaki_budget_log2``, -31 per the recorded hardware A/B;
    override per-call or via ``CVMATRIX_TPU_OZAKI_BUDGET_LOG2``) keeps the
    trimmed tail comparable to the fold pipeline's other error sources
    (the f32-pair total representation at ~2^-48 relative and the
    double-float statistics chain) and >= 1 decade inside the reference's
    1e-8 test contract at bench scale.
    """
    if budget_log2 is None:
        from ..policy import policy

        budget_log2 = policy().ozaki_budget_log2
    lp = _round_up(max(n_l, 1), 32)
    for sp in range(2, n_slices):
        if 1.2 * (sp + 1) * lp * 2.0 ** (-_OZAKI_T_BITS * sp) \
                <= 2.0 ** budget_log2:
            return sp
    return n_slices


def _ozaki_v3_fold_math(total, sa, sb_rev, pa, pb, gx, sxv, yvec, ymask,
                        scal_row, *, center_xtx: bool, center_xty: bool,
                        scale_x: bool, scale_y: bool, with_y: bool,
                        resolution: float):
    """One fold's downdate + X-side stats from pre-gathered slice stacks.

    ``sa``: (Sp, Lp, Kp) int8 mantissa slices of the fold's weighted X rows
    (masked rows already zeroed by the gather); ``sb_rev``: (Sp, Lp, Cp)
    slices of the unweighted [X | Y] rows in REVERSED slice order. Both are
    sliced against DATASET-GLOBAL per-column scales (valid: the downdate's
    error budget is absolute against the total, which carries the global
    scale; see :func:`ozaki_trim_groups` for the trim bound).

    Same-exponent groups run as PREFIX-STACK products: group ``s`` is ONE
    ``sa[: s+1 slices] @ sb_rev[reversed suffix]`` matmul (contiguous row
    blocks of the flattened stacks — row-block ``i`` meets slice ``s-i``),
    so the kernel issues ``Sp`` deep MXU contractions instead of
    ``Sp (Sp+1) / 2`` shallow ones — bit-identical int32 sums, far better
    systolic-array utilisation at small ``Lp``, and ~6x less unrolled
    compile work.

    X-side statistics: the validation-block column sums arrive as exact
    precomputed pairs in ``sxv`` (2, Kp); the squared sums are the X-block
    DIAGONAL of the downdate product itself. The (M-wide) Y-side vectors
    arrive precomputed in ``yvec``: [q-part pair, i2-part pair].
    """
    kp = sa.shape[2]
    # The full math IS the single-tile (bt = Kp) instance of the tiled
    # body — one shared implementation keeps the sym kernel's
    # "computed tiles are bit-identical" contract structural rather than
    # test-enforced.
    [(_, _, oh, ol)] = _ozaki_v3_sym_tiles(
        lambda p, i, j: total[p], sa, sb_rev, pa, pb, gx, sxv, yvec,
        ymask, scal_row, bt=kp, center_xtx=center_xtx,
        center_xty=center_xty, scale_x=scale_x, scale_y=scale_y,
        with_y=with_y, resolution=resolution,
    )
    return oh, ol


def _ozaki_v3_sym_tiles(total_tile, sa, sb_rev, pa, pb, gx, sxv, yvec,
                        ymask, scal_row, *, bt: int, center_xtx: bool,
                        center_xty: bool, scale_x: bool, scale_y: bool,
                        with_y: bool, resolution: float):
    """Upper-tile (i <= j) values of one fold's v3 downdate math.

    The symmetric-mirror decomposition of :func:`_ozaki_v3_fold_math`
    (see the sym LOOCV kernel comment for the mirroring contract):
    prefix-stack products, recombination, statistics and the epilogue run
    per ``bt x bt`` tile for ``i <= j`` only — computed tiles are
    bit-identical to the corresponding regions of the full math (slicing
    commutes with every elementwise op; the per-tile int32 dot sums are
    exact either way, and the X-side squared sums come from the DIAGONAL
    tiles, which are always computed). ``total_tile(p, i, j)`` yields
    plane ``p``'s tile. Returns ``[(i, j, hi, lo), ...]``.
    """
    sp, lp = sa.shape[0], sa.shape[1]
    kp = sa.shape[2]
    cp = sb_rev.shape[2]
    n_t = kp // bt
    sa_flat = sa.reshape(sp * lp, kp)
    sb_flat = sb_rev.reshape(sp * lp, cp)

    # (1, kp) -> (n_t, bt): tile pieces as sublane rows at lane offset 0.
    # Mosaic cannot broadcast lane-offset slices of computed vectors (see
    # _df64_loocv_sym_kernel); kp == cp is enforced by every v3 caller, so
    # the reshape is valid for both row and column vectors (and trivial in
    # the full-math n_t == 1 instance).
    def r2(vec):
        return vec.reshape(n_t, bt)

    pa1, pa2 = r2(pa[0:1, :]), r2(pa[1:2, :])
    pb1, pb2 = r2(pb[0:1, :]), r2(pb[1:2, :])

    prods = {}
    for i in range(n_t):
        for j in range(i, n_t):
            acc_h = acc_l = tail = None
            for s in range(sp):
                d32 = jax.lax.dot_general(
                    sa_flat[: (s + 1) * lp, i * bt:(i + 1) * bt],
                    sb_flat[(sp - 1 - s) * lp:, j * bt:(j + 1) * bt],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                g = d32.astype(jnp.float32) * 2.0 ** (
                    -float(_OZAKI_T_BITS) * (s + 2)
                )
                if s == 0:
                    acc_h = g
                    acc_l = jnp.zeros_like(g)
                elif s < _V3_TAIL_START:
                    t, e = two_sum(acc_h, g)
                    acc_h = t
                    acc_l = acc_l + e
                else:
                    tail = g if tail is None else tail + g
            if tail is not None:
                t, e = two_sum(acc_h, tail)
                acc_h = t
                acc_l = acc_l + e
            # Same sequential exact power-of-two scaling order as the full
            # math (each factor column-sliced to the tile).
            fa1 = pa1[i, :][:, None]
            fa2 = pa2[i, :][:, None]
            fb1 = pb1[j:j + 1, :]
            fb2 = pb2[j:j + 1, :]
            prods[(i, j)] = (acc_h * fa1 * fb1 * fa2 * fb2,
                             acc_l * fa1 * fb1 * fa2 * fb2)

    sw = (scal_row[0], scal_row[1])
    rsw = (scal_row[2], scal_row[3])
    rdv = (scal_row[4], scal_row[5])
    center = center_xtx or (with_y and center_xty)
    scale = scale_x or (with_y and scale_y)
    need_x_mean = center or scale_x

    mX = r1 = None
    if need_x_mean:
        sq = None
        if scale_x:
            ph, pl_ = [], []
            for i in range(n_t):
                d_h, d_l = prods[(i, i)]
                rows = jax.lax.broadcasted_iota(jnp.int32, d_h.shape, 0)
                cols = jax.lax.broadcasted_iota(jnp.int32, d_h.shape, 1)
                dm = rows == cols
                z = jnp.float32(0.0)
                ph.append(jnp.sum(jnp.where(dm, d_h, z), axis=0,
                                  keepdims=True))
                pl_.append(jnp.sum(jnp.where(dm, d_l, z), axis=0,
                                   keepdims=True))
            sq = (jnp.concatenate(ph, axis=1), jnp.concatenate(pl_, axis=1))
        mX, r1 = _df64_side_stats_from_sums(
            (sxv[0:1, :], sxv[1:2, :]), sq, gx, sw, rsw, rdv,
            need_x_mean, scale_x, resolution=resolution,
        )

    pq_vec = None
    if center:
        p = df_mul(mX[0], mX[1], *sw)
        qx = mX if center_xtx else (jnp.zeros_like(mX[0]),
                                    jnp.zeros_like(mX[1]))
        if with_y and center_xty:
            q = df_add(qx[0], qx[1], yvec[0, 0:1, :], yvec[0, 1:2, :])
        else:
            q = qx
        pq_vec = (p[0], p[1], q[0], q[1])

    i12_vec = None
    if scale:
        ones = jnp.ones((1, kp), jnp.float32)
        zeros = jnp.zeros((1, kp), jnp.float32)
        i1 = r1 if scale_x else (ones, zeros)
        i2y = (yvec[1, 0:1, :], yvec[1, 1:2, :])
        i2 = (jnp.where(ymask > 0, i2y[0], i1[0]),
              jnp.where(ymask > 0, i2y[1], i1[1]))
        i12_vec = (i1[0], i1[1], i2[0], i2[1])

    pq2 = None if pq_vec is None else tuple(r2(p) for p in pq_vec)
    i122 = None if i12_vec is None else tuple(r2(p) for p in i12_vec)
    out = []
    for i in range(n_t):
        for j in range(i, n_t):
            d_h, d_l = prods[(i, j)]
            pq = None
            if center:
                pq = (pq2[0][i, :][:, None], pq2[1][i, :][:, None],
                      pq2[2][j:j + 1, :], pq2[3][j:j + 1, :])
            i12 = None
            if scale:
                i12 = (i122[0][i, :][:, None], i122[1][i, :][:, None],
                       i122[2][j:j + 1, :], i122[3][j:j + 1, :])
            tt = [total_tile(0, i, j), total_tile(1, i, j)]
            oh, ol = _df64_ref_epilogue_vals(tt, d_h, d_l, pq, i12)
            out.append((i, j, oh, ol))
    return out


def _ozaki_v3_sym_kernel(total_ref, sa_ref, sb_ref, pa_ref, pb_ref, gx_ref,
                         sxv_ref, yvec_ref, ymask_ref, scal_ref, out_ref, *,
                         bt: int, **flags):
    """Pallas wrapper of :func:`_ozaki_v3_sym_tiles`: write computed tiles,
    mirror the strictly-lower ones by in-register transpose."""
    tiles = _ozaki_v3_sym_tiles(
        lambda p, i, j: total_ref[
            p, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt
        ],
        sa_ref[:], sb_ref[:], pa_ref[:], pb_ref[:], gx_ref[:], sxv_ref[0],
        yvec_ref[0], ymask_ref[0:1, :], scal_ref[0, 0], bt=bt, **flags,
    )
    for i, j, oh, ol in tiles:
        out_ref[0, 0, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = oh
        out_ref[0, 1, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = ol
        if j > i:
            out_ref[0, 0, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                jnp.transpose(oh)
            )
            out_ref[0, 1, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                jnp.transpose(ol)
            )


def _ozaki_v3_kernel(total_ref, sa_ref, sb_ref, pa_ref, pb_ref, gx_ref,
                     sxv_ref, yvec_ref, ymask_ref, scal_ref, out_ref,
                     **flags):
    """Grid (F,): one step per fold — the slice stacks arrive pre-gathered
    as contiguous (Sp, Lp, Kp/Cp) blocks (two DMAs per fold instead of one
    per validation row)."""
    oh, ol = _ozaki_v3_fold_math(
        total_ref, sa_ref[:], sb_ref[:], pa_ref[:], pb_ref[:],
        gx_ref[:], sxv_ref[0], yvec_ref[0], ymask_ref[0:1, :],
        scal_ref[0, 0], **flags,
    )
    out_ref[0, 0] = oh
    out_ref[0, 1] = ol


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "interpret"),
)
def fused_ozaki_downdate_v3(
    total2: jax.Array,  # (2, KP, CP) total pair planes, KP == CP
    sa: jax.Array,      # (Sp, F * Lp, KP) int8: gathered weighted-X slices
    sb_rev: jax.Array,  # (Sp, F * Lp, CP) int8: [X | Y] slices, REVERSED
    pa: jax.Array,      # (2, KP) f32 exact 2^e half-factors, A side (global)
    pb: jax.Array,      # (2, CP) f32 half-factors, B side (global)
    gx: jax.Array,      # (4, KP) global [sum_X, sum_sq_X] pairs
    sxv: jax.Array,     # (F, 2, KP) f32: exact per-fold X colsum pairs
    yvec: jax.Array,    # (F, 2, 2, CP): [q-part pair, i2-part pair] (Y cols)
    ymask: jax.Array,   # (1, CP) f32: 1.0 on Y columns
    scal: jax.Array,    # (F, 1, 128) f32 per-fold scalar pairs
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    interpret: bool = False,
) -> jax.Array:
    """Pre-gathered fused Ozaki downdate -> (F, 2, KP, CP) pairs.

    v3 of the fused Ozaki design: the caller gathers each chunk's fold rows
    out of the dataset-global slice planes with ONE fused XLA gather per
    side (``gather_ozaki_rows``) — masked rows zeroed there — so the kernel
    sees contiguous per-fold (Sp, Lp, KP) stacks and a plain (F,) grid. The
    v2 per-row scalar-prefetch gather issued 2 * Lp small DMAs per fold and
    was DMA-issue-bound at P >= 1000 (measured ~7 us per 8-row step on a
    v5e); here each fold is two large DMAs, the group products run as deep
    prefix-stack contractions, and groups beyond :func:`ozaki_trim_groups`
    are dropped inside a documented error budget.
    """
    sp_slices, rows_total, kp = sa.shape
    cp = sb_rev.shape[2]
    f_folds = scal.shape[0]
    if rows_total % f_folds:
        raise ValueError(
            f"row count {rows_total} is not a multiple of the fold count "
            f"{f_folds} — a floor-divided stride would silently read the "
            "wrong folds' rows"
        )
    lp = rows_total // f_folds
    if kp != cp:
        raise ValueError(f"requires KP == CP, got ({kp},{cp})")
    # 65^2: pair-rounded slices can reach +-(2^T_BITS + 1).
    if sp_slices * lp * 65 * 65 >= 2 ** 24:
        raise ValueError("fold rows too large for single-f32 group sums")
    c2 = lambda f: (f * 0, f * 0)  # noqa: E731
    c3 = lambda f: (f * 0, f * 0, f * 0)  # noqa: E731
    grid = (f_folds,)
    return pl.pallas_call(
        functools.partial(
            _ozaki_v3_kernel,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, kp, cp), c3),
            pl.BlockSpec((sp_slices, lp, kp), lambda f: (f * 0, f, f * 0)),
            pl.BlockSpec((sp_slices, lp, cp), lambda f: (f * 0, f, f * 0)),
            pl.BlockSpec((2, kp), c2),
            pl.BlockSpec((2, cp), c2),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((1, 2, kp), lambda f: (f, f * 0, f * 0)),
            pl.BlockSpec((1, 2, 2, cp), lambda f: (f, f * 0, f * 0, f * 0)),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((1, 1, 128), lambda f: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f: (f, f * 0, f * 0, f * 0)),
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(
                f_folds * kp * cp
                * (sp_slices * (sp_slices + 1) * lp
                   + 7 * sp_slices + 80)
            ),
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 8
                + f_folds * sp_slices * lp * (kp + cp)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total2, sa, sb_rev, pa, pb, gx, sxv, yvec, ymask, scal)


@functools.partial(
    jax.jit,
    static_argnames=("center_xtx", "center_xty", "scale_x", "scale_y",
                     "with_y", "resolution", "bt", "interpret"),
)
def fused_ozaki_downdate_v3_sym(
    total2: jax.Array,  # (2, KP, CP) total pair planes, KP == CP
    sa: jax.Array,      # (Sp, F * Lp, KP) int8
    sb_rev: jax.Array,  # (Sp, F * Lp, CP) int8, REVERSED slice order
    pa: jax.Array,
    pb: jax.Array,
    gx: jax.Array,
    sxv: jax.Array,
    yvec: jax.Array,
    ymask: jax.Array,
    scal: jax.Array,
    *,
    center_xtx: bool,
    center_xty: bool,
    scale_x: bool,
    scale_y: bool,
    with_y: bool,
    resolution: float,
    bt: int = _SYM_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Symmetry-exploiting sibling of :func:`fused_ozaki_downdate_v3`.

    Same operands and output; the MXU prefix-stack products, the
    recombination chains AND the epilogue run only for tiles ``i <= j``,
    with strictly-lower tiles written as in-register transposes — ~1/4
    less of everything but the stores at KP = 512 / 2 tiles per side.
    Mirrored entries carry the ~2^-46 factor-form rounding asymmetry
    (see :func:`fused_loocv_df64_sym`); Y columns mirror into padding
    rows, which every consumer slices off.
    """
    sp_slices, rows_total, kp = sa.shape
    cp = sb_rev.shape[2]
    f_folds = scal.shape[0]
    if rows_total % f_folds:
        raise ValueError(
            f"row count {rows_total} is not a multiple of the fold count "
            f"{f_folds} — a floor-divided stride would silently read the "
            "wrong folds' rows"
        )
    lp = rows_total // f_folds
    if kp != cp or kp % bt or kp // bt < 2:
        raise ValueError(
            f"sym kernel needs KP == CP, KP % {bt} == 0, >= 2 tiles; "
            f"got ({kp}, {cp})"
        )
    if sp_slices * lp * 65 * 65 >= 2 ** 24:
        raise ValueError("fold rows too large for single-f32 group sums")
    c2 = lambda f: (f * 0, f * 0)  # noqa: E731
    c3 = lambda f: (f * 0, f * 0, f * 0)  # noqa: E731
    n_t = kp // bt
    n_upper = n_t * (n_t + 1) // 2
    frac = n_upper / (n_t * n_t)
    return pl.pallas_call(
        functools.partial(
            _ozaki_v3_sym_kernel, bt=bt,
            center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        ),
        grid=(f_folds,),
        in_specs=[
            pl.BlockSpec((2, kp, cp), c3),
            pl.BlockSpec((sp_slices, lp, kp), lambda f: (f * 0, f, f * 0)),
            pl.BlockSpec((sp_slices, lp, cp), lambda f: (f * 0, f, f * 0)),
            pl.BlockSpec((2, kp), c2),
            pl.BlockSpec((2, cp), c2),
            pl.BlockSpec((4, kp), c2),
            pl.BlockSpec((1, 2, kp), lambda f: (f, f * 0, f * 0)),
            pl.BlockSpec((1, 2, 2, cp), lambda f: (f, f * 0, f * 0, f * 0)),
            pl.BlockSpec((1, cp), c2),
            pl.BlockSpec((1, 1, 128), lambda f: (f, f * 0, f * 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, kp, cp),
                               lambda f: (f, f * 0, f * 0, f * 0)),
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(
                f_folds * kp * cp
                * (sp_slices * (sp_slices + 1) * lp
                   + 7 * sp_slices + 80) * frac
            ),
            bytes_accessed=(
                f_folds * kp * cp * 8 + kp * cp * 8
                + f_folds * sp_slices * lp * (kp + cp)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(total2, sa, sb_rev, pa, pb, gx, sxv, yvec, ymask, scal)


def fused_ozaki_v3_sym_reference(
    idx2d, mask2d, total2, saN, sbN_rev, pa, pb, gx, sxv, yvec, ymask,
    scal, *, center_xtx, center_xty, scale_x, scale_y, with_y, resolution,
    bt: int = _SYM_TILE,
):
    """Eager reference of :func:`fused_ozaki_downdate_v3_sym` (do NOT jit)."""
    f_folds, n_l = idx2d.shape
    kp = total2.shape[1]
    cp = total2.shape[2]
    outs = []
    for f in range(int(f_folds)):
        rows = np.asarray(idx2d[f])
        sa = jnp.asarray(np.asarray(saN)[:, rows])
        sb = jnp.asarray(np.asarray(sbN_rev)[:, rows])
        if mask2d is not None:
            m = jnp.asarray(np.asarray(mask2d[f]), jnp.float32)
            sa = jnp.where(m[None, :, None] > 0, sa, jnp.zeros_like(sa))
        tiles = _ozaki_v3_sym_tiles(
            lambda p, i, j: total2[p, i * bt:(i + 1) * bt,
                                   j * bt:(j + 1) * bt],
            sa, sb, pa, pb, gx, sxv[f], yvec[f], ymask[0:1, :], scal[f, 0],
            bt=bt, center_xtx=center_xtx, center_xty=center_xty,
            scale_x=scale_x, scale_y=scale_y, with_y=with_y,
            resolution=resolution,
        )
        buf = np.zeros((2, kp, cp), np.float32)
        for i, j, oh, ol in tiles:
            buf[0, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = np.asarray(oh)
            buf[1, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt] = np.asarray(ol)
            if j > i:
                buf[0, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                    np.asarray(oh).T
                )
                buf[1, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt] = (
                    np.asarray(ol).T
                )
        outs.append(buf)
    return jnp.asarray(np.stack(outs))


def fused_ozaki_v3_reference(
    idx2d, mask2d, total2, saN, sbN_rev, pa, pb, gx, sxv, yvec, ymask,
    scal, *, center_xtx, center_xty, scale_x, scale_y, with_y, resolution,
):
    """Eager reference of :func:`fused_ozaki_downdate_v3` (do NOT jit).

    Gathers from the slice-major dataset planes exactly like
    :func:`cvmatrix_tpu.core.batch.gather_ozaki_rows` and runs the same
    fold math eagerly (interpret mode's FMA/excess precision is not
    f32-faithful on CPU; eager per-op rounding is).
    """
    f_folds, n_l = idx2d.shape
    outs = []
    for f in range(int(f_folds)):
        rows = np.asarray(idx2d[f])
        sa = jnp.asarray(np.asarray(saN)[:, rows])      # (Sp, Lp, KP)
        sb = jnp.asarray(np.asarray(sbN_rev)[:, rows])  # (Sp, Lp, CP)
        if mask2d is not None:
            m = jnp.asarray(np.asarray(mask2d[f]), jnp.float32)
            sa = jnp.where(m[None, :, None] > 0, sa, jnp.zeros_like(sa))
        oh, ol = _ozaki_v3_fold_math(
            total2, sa, sb, pa, pb, gx, sxv[f], yvec[f], ymask[0:1, :],
            scal[f, 0],
            center_xtx=center_xtx, center_xty=center_xty, scale_x=scale_x,
            scale_y=scale_y, with_y=with_y, resolution=resolution,
        )
        outs.append(jnp.stack([oh, ol]))
    return jnp.stack(outs)


# --------------------------------------------------------------------------- #
# Mantissa slicing kernel: f32-pair rounding, ~3x cheaper than emulated f64   #
# --------------------------------------------------------------------------- #


def _slice_rows_math(x_h, x_l, p1, p2, n_slices):
    """Slice a pre-padded pair block into int8 mantissa slices.

    ``x = x_h + x_l`` scaled by the exact power-of-two factors ``p1 * p2``
    (per column). Per round: ``q0 = round(r_h)`` plus a +-1 correction from
    the pair tail, so the emitted integer is within 1 of the true rounding
    — the residual subtracts exactly what was emitted, keeping the slice
    decomposition EXACT (slice values stay within [-65, 65], still int8,
    and products still fit the int32 budget). ~12 f32 flops per element per
    round vs ~30 for the emulated-f64 slicing chain.
    """
    r_h = x_h * p1 * p2
    r_l = x_l * p1 * p2
    mul = float(1 << _OZAKI_T_BITS)
    out = []
    for _ in range(n_slices):
        r_h = r_h * mul
        r_l = r_l * mul
        q0 = jnp.round(r_h)
        d = (r_h - q0) + r_l          # (r_h - q0) exact: both near integers
        adj = jnp.round(d)
        out.append((q0 + adj).astype(jnp.int8))
        t, e = two_sum(r_h - q0 - adj, r_l)
        r_h, r_l = t, e
    return out


def _slice_rows_kernel(xh_ref, xl_ref, p_ref, out_ref, *, n_slices: int,
                       row_major: bool):
    sl = _slice_rows_math(xh_ref[:], xl_ref[:], p_ref[0:1, :], p_ref[1:2, :],
                          n_slices)
    for s in range(n_slices):
        if row_major:
            out_ref[:, s, :] = sl[s]
        else:
            out_ref[s] = sl[s]


@functools.partial(
    jax.jit, static_argnames=("n_slices", "row_major", "block_rows",
                              "interpret"),
)
def slice_rows(
    xh: jax.Array,   # (N, K) f32 hi plane (pre-padded columns)
    xl: jax.Array,   # (N, K) f32 lo plane
    pows: jax.Array,  # (2, K) f32 exact 2^-e half-factors
    *,
    n_slices: int = 10,
    row_major: bool = True,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Mantissa slices of pair rows -> (N, S, K) int8 (or (S, N, K)).

    ``row_major=True`` lays slices per row (the v2 fused kernel's gather
    layout); ``False`` lays them slice-major (the layout the XLA
    prefix-stack contraction consumes). N must be a multiple of
    ``block_rows``.
    """
    n, k = xh.shape
    if n % block_rows:
        raise ValueError(f"N={n} not a multiple of block_rows={block_rows}")
    grid = (n // block_rows,)
    if row_major:
        out_shape = jax.ShapeDtypeStruct((n, n_slices, k), jnp.int8)
        out_spec = pl.BlockSpec((block_rows, n_slices, k),
                                lambda i: (i, i * 0, i * 0))
    else:
        out_shape = jax.ShapeDtypeStruct((n_slices, n, k), jnp.int8)
        out_spec = pl.BlockSpec((n_slices, block_rows, k),
                                lambda i: (i * 0, i, i * 0))
    return pl.pallas_call(
        functools.partial(_slice_rows_kernel, n_slices=n_slices,
                          row_major=row_major),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda i: (i, i * 0)),
            pl.BlockSpec((block_rows, k), lambda i: (i, i * 0)),
            pl.BlockSpec((2, k), lambda i: (i * 0, i * 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n_slices * n * k,
            bytes_accessed=n * k * (8 + n_slices),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xh, xl, pows)
