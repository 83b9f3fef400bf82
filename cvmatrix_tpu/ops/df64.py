"""Double-float (f32 hi/lo pair) arithmetic building blocks.

TPUs have no float64 compute units. XLA emulates f64 elementwise ops with
f32 pairs accurately but expensively (and only op-by-op — every intermediate
is renormalised and round-trips HBM unless fused). This module provides the
same double-word arithmetic as composable jnp functions usable INSIDE Pallas
kernels, where a whole per-fold epilogue chain can run on registers with
renormalisation only where the error budget demands it.

Error model: a value is an unevaluated pair ``(hi, lo)`` with
``hi + lo == x + O(2^-48 |x|)`` (f32 has a 24-bit significand; a normalised
pair carries ~48-49 bits). The TPU VPU has no fused multiply-add with single
rounding (verified empirically: ``a*b - p`` is compiled as two rounded ops),
so exact products use Dekker splitting (``2^12+1``).

These primitives echo the classic double-double literature (Dekker 1971,
Knuth TAOCP v2, Hida/Li/Bailey's QD), specialised to f32 pairs and to the
"sloppy" variants whose dropped terms stay below the engine's 2^-45-grade
target (the numerical contract is agreement with NumPy f64 at atol 1e-8 —
reference ``tests/test_cvmatrix.py:420-537`` — with several orders of
magnitude of margin at test scale).

The reference has no analogue of this module: it runs NumPy/CUDA f64
natively (SURVEY.md §0).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = [
    "SPLIT",
    "split",
    "two_sum",
    "quick_two_sum",
    "two_prod_presplit",
    "df_from_f64",
    "df_to_f64",
    "df_add",
    "df_mul",
    "df_mul_presplit",
    "df_sub",
    "df_neg",
    "df_recip",
    "df_sqrt",
]

# Dekker split constant for f32: 2^12 + 1 (24-bit significand -> 12|12 halves,
# the sign bit of the low half buying the 13th bit). A Python literal so it
# inlines into Pallas kernels instead of being captured as a traced constant.
SPLIT = 4097.0


def split(a):
    """Dekker split: a == ah + al with ah, al each 12-bit exact."""
    c = SPLIT * a
    ah = c - (c - a)
    return ah, a - ah


def two_sum(a, b):
    """Knuth's exact addition: a + b == s + e exactly (6 flops)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact addition assuming |a| >= |b| (3 flops)."""
    s = a + b
    return s, b - (s - a)


def two_prod_presplit(a, ah, al, b, bh, bl):
    """Exact product a*b == p + e given Dekker splits of both operands.

    The ``al*bl`` term is kept: it costs one multiply and keeps the product
    exact, which simplifies the error accounting of everything above.
    """
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_from_f64(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f64 -> (hi, lo) f32 pair; hi+lo matches x to ~2^-48 relative.

    Runs under XLA's accurate f64 emulation (elementwise casts/subtract),
    so it is exact in the double-word sense.
    """
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


def df_to_f64(hi, lo):
    """(hi, lo) -> f64 via one accurately-emulated add."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def df_mul(ah, al, bh, bl):
    """Pair x pair multiply -> unevaluated pair (splits computed inline)."""
    ahh, ahl = split(ah)
    bhh, bhl = split(bh)
    return df_mul_presplit(ah, al, ahh, ahl, bh, bl, bhh, bhl)


def df_mul_presplit(ah, al, ahh, ahl, bh, bl, bhh, bhl):
    """Pair x pair multiply with both hi-part splits supplied.

    Sloppy in the pair sense: the result is an unevaluated pair whose low
    word may reach ~2 ulp(hi); relative error ~2^-46. The ``al*bl`` term is
    dropped (below 2^-48 relative).
    """
    p, e = two_prod_presplit(ah, ahh, ahl, bh, bhh, bhl)
    return p, e + (ah * bl + al * bh)


def df_neg(ah, al):
    return -ah, -al


def df_add(ah, al, bh, bl):
    """Pair addition with exact hi-part compensation (sloppy low word)."""
    s, e = two_sum(ah, bh)
    return s, e + (al + bl)


def df_sub(ah, al, bh, bl):
    """Pair subtraction with exact hi-part compensation (sloppy low word)."""
    s, e = two_sum(ah, -bh)
    return s, e + (al - bl)


def df_recip(bh, bl):
    """Pair reciprocal 1/(bh + bl) via one double-word Newton step.

    Seed ``q0 = 1/bh`` is correctly-rounded f32 (~2^-24); the residual
    ``r = 1 - b*q0`` is formed with an exact TwoProd (the ``1 - p`` subtract
    is exact by Sterbenz since ``p`` is within a rounding of 1), so the
    corrected pair carries ~2^-46 relative error. b == +-0 yields NaN
    (0 * inf inside the correction) — callers must clamp zeros first.
    """
    q0 = 1.0 / bh
    q0h, q0l = split(q0)
    bhh, bhl = split(bh)
    p, e = two_prod_presplit(bh, bhh, bhl, q0, q0h, q0l)
    r = ((1.0 - p) - e) - bl * q0
    return quick_two_sum(q0, q0 * r)


def df_sqrt(ah, al):
    """Pair square root of a nonnegative pair; a <= 0 returns exact 0.

    Seed ``s0 = sqrt(ah)`` (correctly-rounded f32), then one double-word
    Newton step ``s = s0 + (a - s0^2) / (2 s0)`` with the square formed
    exactly — ~2^-46 relative.
    """
    safe = jnp.maximum(ah, jnp.float32(1e-38))
    s0 = jnp.sqrt(safe)
    s0h, s0l = split(s0)
    p, e = two_prod_presplit(s0, s0h, s0l, s0, s0h, s0l)
    r = ((ah - p) - e) + al
    s1 = (0.5 / s0) * r
    sh, sl = quick_two_sum(s0, s1)
    zero = ah <= 0
    z = jnp.float32(0.0)
    return jnp.where(zero, z, sh), jnp.where(zero, z, sl)
