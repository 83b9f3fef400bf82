"""Pallas fused downdate kernel vs the plain jnp epilogue (interpret mode).

On CPU the kernel runs through the Pallas interpreter; the same code path is
exercised compiled on TPU by the benchmark harness.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose


def _ref(total, xv, m2, a1, mb, inv1, inv2, center, scale):
    prod = np.einsum("flk,flc->fkc", xv, m2)
    t = total[None] - prod
    if center:
        t = t - a1[:, :, None] * mb[:, None, :]
    if scale:
        t = t * (inv1[:, :, None] * inv2[:, None, :])
    return t


@pytest.mark.parametrize("center,scale", [(False, False), (True, False),
                                          (False, True), (True, True)])
@pytest.mark.parametrize("shape", [(3, 1, 20, 7), (2, 5, 130, 130),
                                   (1, 9, 64, 10)])
def test_fused_downdate_interpret(monkeypatch, center, scale, shape):
    import cvmatrix_tpu.ops.kernels as kernels
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(kernels.pl, "pallas_call", interp)

    f_folds, L, K, C = shape
    rng = np.random.default_rng(0)
    total = rng.standard_normal((K, C)).astype(np.float32)
    xv = rng.standard_normal((f_folds, L, K)).astype(np.float32)
    m2 = rng.standard_normal((f_folds, L, C)).astype(np.float32)
    a1 = rng.standard_normal((f_folds, K)).astype(np.float32)
    mb = rng.standard_normal((f_folds, C)).astype(np.float32)
    inv1 = (1.0 + rng.random((f_folds, K))).astype(np.float32)
    inv2 = (1.0 + rng.random((f_folds, C))).astype(np.float32)

    got = np.asarray(
        kernels.fused_downdate(
            jnp.asarray(total), jnp.asarray(xv), jnp.asarray(m2),
            jnp.asarray(a1), jnp.asarray(mb),
            jnp.asarray(inv1), jnp.asarray(inv2),
            center=center, scale=scale,
            block_k=128, block_c=128, block_l=8,
        )
    )
    ref = _ref(total, xv, m2, a1, mb, inv1, inv2, center, scale)
    assert got.shape == ref.shape
    assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def _ref_df64(total, u, v, p, q, i1, i2, center, scale):
    """f64 reference of the factor-scaled epilogue."""
    t = np.einsum("fk,fc->fkc", i1, i2) * total[None] if scale \
        else np.broadcast_to(total[None], (u.shape[0],) + total.shape).copy()
    t = t - np.einsum("flk,flc->fkc", u, v)
    if center:
        t = t - p[:, :, None] * q[:, None, :]
    return t


@pytest.mark.parametrize("center,scale", [(True, True), (False, False)])
@pytest.mark.parametrize("shape,blocks", [
    ((2, 1, 300, 270), (128, 128)),   # multi-tile grid (KT=3, CT=3)
    ((3, 4, 140, 20), (128, 128)),    # multi-row accumulation + tiles
])
def test_fused_downdate_df64_multitile_interpret(monkeypatch, center, scale,
                                                 shape, blocks):
    """df64 kernel across a multi-tile grid agrees with f64 at ~1e-13 rel."""
    import cvmatrix_tpu.ops.kernels as kernels
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(kernels.pl, "pallas_call", interp)

    from cvmatrix_tpu.ops.df64 import df_from_f64, split as dsplit

    f_folds, L, K, C = shape
    bk, bc = blocks
    rng = np.random.default_rng(3)
    total = rng.standard_normal((K, C)) * 100
    u = rng.standard_normal((f_folds, L, K))
    v = rng.standard_normal((f_folds, L, C))
    p = rng.standard_normal((f_folds, K))
    q = rng.standard_normal((f_folds, C))
    i1 = 1.0 + rng.random((f_folds, K))
    i2 = 1.0 + rng.random((f_folds, C))

    def pair(x):
        hi, lo = df_from_f64(jnp.asarray(x))
        return jnp.stack([hi, lo])

    th, tl = df_from_f64(jnp.asarray(total))
    thh, thl = dsplit(th)
    total4 = jnp.stack([th, tl, thh, thl])

    out = kernels.fused_downdate_df64(
        total4, pair(u), pair(v),
        pair(p) if center else None, pair(q) if center else None,
        pair(i1) if scale else None, pair(i2) if scale else None,
        center=center, scale=scale, block_k=bk, block_c=bc,
    )
    got = np.asarray(out[:, 0], np.float64) + np.asarray(out[:, 1], np.float64)
    ref = _ref_df64(total, u, v, p, q, i1, i2, center, scale)
    err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
    assert err < 1e-12, err
