"""Pallas fused downdate kernel vs the plain jnp epilogue (interpret mode).

On CPU the kernel runs through the Pallas interpreter; the same code path is
exercised compiled on TPU by the benchmark harness.
"""

import jax
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
