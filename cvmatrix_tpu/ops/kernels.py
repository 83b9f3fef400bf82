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

__all__ = ["fused_downdate"]


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
            t = t - a1_ref[0][:, None] * mb_ref[0][None, :]
        if scale:
            t = t * (i1_ref[0][:, None] * i2_ref[0][None, :])
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
        a1_p = pad(a1, (f_folds, kp))
        mb_p = pad(mb, (f_folds, cp))
    else:
        a1_p = jnp.zeros((f_folds, kp), jnp.float32)
        mb_p = jnp.zeros((f_folds, cp), jnp.float32)
    if scale:
        i1_p = jnp.ones((f_folds, kp), jnp.float32).at[:, :k].set(
            inv1.astype(jnp.float32)
        )
        i2_p = jnp.ones((f_folds, cp), jnp.float32).at[:, :c].set(
            inv2.astype(jnp.float32)
        )
    else:
        i1_p = jnp.ones((f_folds, kp), jnp.float32)
        i2_p = jnp.ones((f_folds, cp), jnp.float32)

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
            pl.BlockSpec((1, bk), lambda f, i, j, l: (f, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda f, i, j, l: (f, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda f, i, j, l: (f, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda f, i, j, l: (f, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bk, bc), lambda f, i, j, l: (f, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_folds, kp, cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bk, bc), jnp.float32)],
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
