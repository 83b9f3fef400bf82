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

from .df64 import (
    df_mul_presplit,
    quick_two_sum,
    split,
    two_prod_presplit,
    two_sum,
)

__all__ = [
    "fused_downdate",
    "fused_downdate_df64",
    "fused_downdate_df64_packed",
    "fused_epilogue_df64",
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
    jax.jit, static_argnames=("center", "scale", "block_k", "block_c", "block_l")
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
    """Same math as :func:`_df64_kernel`, but the per-fold K-side vectors
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
        d_h, d_l = acc_h[:], acc_l[:]
        if center:
            p_h = kv_ref[0, 0, 0][:, None]
            p_lo = kv_ref[0, 0, 1][:, None]
            q_h = cv_ref[0, 0, 0][None, :]
            q_lo = cv_ref[0, 0, 1][None, :]
            phh, phl = split(p_h)
            qhh, qhl = split(q_h)
            ch, ce = df_mul_presplit(p_h, p_lo, phh, phl, q_h, q_lo, qhh, qhl)
            s, e = two_sum(d_h, ch)
            d_h = s
            d_l = d_l + (e + ce)

        t_h = total_ref[0]
        t_lo = total_ref[1]
        if scale:
            if presplit_total:
                thh = total_ref[2]
                thl = total_ref[3]
            else:
                # huge-K mode: the total rides as 2 planes (half the HBM)
                # and its Dekker split costs 4 extra flops per element.
                thh, thl = split(t_h)
            i1_h = kv_ref[0, 1, 0][:, None]
            i1_lo = kv_ref[0, 1, 1][:, None]
            i2_h = cv_ref[0, 1, 0][None, :]
            i2_lo = cv_ref[0, 1, 1][None, :]
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
        oh, ol = quick_two_sum(oh, oe + (t_l_out - d_l))
        out_ref[0, 0] = oh
        out_ref[0, 1] = ol


@functools.partial(
    jax.jit, static_argnames=("center", "scale", "block_k", "block_c")
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
    )(total4, u, v, kvec, cvec)
    return out


# --------------------------------------------------------------------------- #
# Epilogue-only variant: downdate product precomputed (large folds)           #
# --------------------------------------------------------------------------- #


def _df64_epilogue_kernel(total_ref, prod_h_ref, prod_l_ref, kv_ref, cv_ref,
                          out_ref, *, center: bool, scale: bool):
    """out = (total - prod - p (x) q) (.) (i1 (x) i2), all double-float.

    For folds with many validation rows the rank-L downdate product is far
    cheaper on the MXU (exact int8-slice contraction,
    :func:`cvmatrix_tpu.ops.precise.ozaki_contract`) than as an L-step VPU
    accumulation; this kernel then applies the remaining one-pass epilogue.
    Note the center term sits INSIDE the scale here (reference form,
    ``cvmatrix/cvmatrix.py:1001-1009``) so p/q are the unscaled
    ``sum_w_train * mean1`` / ``mean2`` vectors.
    """
    d_h = prod_h_ref[0]
    d_l = prod_l_ref[0]
    if center:
        p_h = kv_ref[0, 0, 0][:, None]
        p_lo = kv_ref[0, 0, 1][:, None]
        q_h = cv_ref[0, 0, 0][None, :]
        q_lo = cv_ref[0, 0, 1][None, :]
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

    if scale:
        i1_h = kv_ref[0, 1, 0][:, None]
        i1_lo = kv_ref[0, 1, 1][:, None]
        i2_h = cv_ref[0, 1, 0][None, :]
        i2_lo = cv_ref[0, 1, 1][None, :]
        i1hh, i1hl = split(i1_h)
        i2hh, i2hl = split(i2_h)
        chh, chl = split(c_h)
        t2h, t2e = two_prod_presplit(c_h, chh, chl, i1_h, i1hh, i1hl)
        t2l = t2e + (c_h * i1_lo + c_l * i1_h)
        t2hh, t2hl = split(t2h)
        tsh, tse = two_prod_presplit(t2h, t2hh, t2hl, i2_h, i2hh, i2hl)
        c_h = tsh
        c_l = tse + (t2h * i2_lo + t2l * i2_h)

    oh, ol = quick_two_sum(c_h, c_l)
    out_ref[0, 0] = oh
    out_ref[0, 1] = ol


@functools.partial(
    jax.jit, static_argnames=("center", "scale", "block_k", "block_c")
)
def fused_epilogue_df64(
    total_planes: jax.Array,  # (2, Kp, Cp) pair (padded)
    prod_hi: jax.Array,       # (F, Kp, Cp) downdate-product hi
    prod_lo: jax.Array,       # (F, Kp, Cp) downdate-product lo
    kvec: jax.Array,          # (F, 2, 2, Kp): [p, i1] pairs (unscaled p!)
    cvec: jax.Array,          # (F, 2, 2, Cp): [q, i2] pairs
    *,
    center: bool,
    scale: bool,
    block_k: int = 512,
    block_c: int = 512,
) -> jax.Array:
    """(total - prod - p (x) q) (.) (i1 (x) i2) -> (F, 2, Kp, Cp) pairs.

    ``prod_hi``/``prod_lo`` arrive as SEPARATE pre-padded planes so the
    caller's pair conversion fuses straight out of the contraction — a
    stacked/padded copy of a (Kp, Cp) product is gigabytes at genomics-wide
    K and was the peak HBM allocation before this layout.
    """
    f_folds = prod_hi.shape[0]
    kp, cp = total_planes.shape[1], total_planes.shape[2]
    bk = min(block_k, kp)
    bc = min(block_c, cp)
    if kp % bk or cp % bc:
        raise ValueError(f"padded dims ({kp},{cp}) not multiples of "
                         f"({bk},{bc})")
    grid = (f_folds, kp // bk, cp // bc)
    return pl.pallas_call(
        functools.partial(_df64_epilogue_kernel, center=center, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, bk, bc), lambda f, i, j: (f * 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bc), lambda f, i, j: (f, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bc), lambda f, i, j: (f, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bk), lambda f, i, j: (f, f * 0, f * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, bc), lambda f, i, j: (f, f * 0, f * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, bk, bc),
                               lambda f, i, j: (f, f * 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_folds, 2, kp, cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=90 * f_folds * kp * cp,
            bytes_accessed=f_folds * kp * cp * 16 + kp * cp * 8,
            transcendentals=0,
        ),
    )(total_planes, prod_hi, prod_lo, kvec, cvec)


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
    jax.jit, static_argnames=("center", "scale", "block_k", "block_c")
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
            bytes_accessed=f_folds * kp * cp * 4 + kp * cp * 4,
            transcendentals=0,
        ),
    )(total_planes, u, v, kvec, cvec)
