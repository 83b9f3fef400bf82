"""jit/vmap batching semantics (the headline usage pattern).

Mirrors the reference's trace-semantics coverage
(``tests/test_cvmatrix.py:601-683``): jit(vmap(...)) over stacked equal-size
folds matches eager per-fold results, for weighted and unweighted data; plus
the masked padded-batch extension (no reference equivalent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from cvmatrix_tpu import CVMatrix, Partitioner, fit, training_XTX_XTY

from .data import make_dataset, zero_fraction

X_ALL, Y_ALL, FOLDS, WEIGHTS = make_dataset()


@pytest.mark.parametrize("use_w", [False, True])
def test_jit_vmap_matches_eager(use_w):
    X = X_ALL[:, :6]
    n_folds = 5
    n = (X.shape[0] // n_folds) * n_folds
    X, Y = X[:n], Y_ALL[:n]
    w = zero_fraction(WEIGHTS[:n]) if use_w else None
    folds = np.arange(n) % n_folds
    p = Partitioner(folds)
    cvm = CVMatrix(True, True, True, True, 1).fit(X, Y, w)
    batch = jnp.asarray(np.stack([p.get_validation_indices(f) for f in p.folds_dict]))
    (xtx_b, xty_b), (xm_b, xs_b, ym_b, ys_b) = jax.jit(
        jax.vmap(cvm.training_XTX_XTY)
    )(batch)
    for i, f in enumerate(p.folds_dict):
        (xtx, xty), (xm, xs, ym, ys) = cvm.training_XTX_XTY(
            p.get_validation_indices(f)
        )
        assert_allclose(np.asarray(xtx_b[i]), np.asarray(xtx), atol=1e-8, rtol=1e-8)
        assert_allclose(np.asarray(xty_b[i]), np.asarray(xty), atol=1e-8, rtol=1e-8)
        assert_allclose(np.asarray(xm_b[i]), np.asarray(xm), atol=1e-8, rtol=1e-8)
        assert_allclose(np.asarray(xs_b[i]), np.asarray(xs), atol=1e-8, rtol=1e-8)
        assert_allclose(np.asarray(ym_b[i]), np.asarray(ym), atol=1e-8, rtol=1e-8)
        assert_allclose(np.asarray(ys_b[i]), np.asarray(ys), atol=1e-8, rtol=1e-8)


def test_masked_padded_batch_matches_eager():
    """Unequal folds in ONE compiled program via padding + mask."""
    folds = np.concatenate([np.zeros(97), np.ones(41), np.full(62, 2.0),
                            np.full(400, 3.0)])
    X, Y = X_ALL[: folds.size], Y_ALL[: folds.size]
    w = zero_fraction(WEIGHTS[: folds.size])
    p = Partitioner(folds)
    cvm = CVMatrix(True, True, True, True, 1).fit(X, Y, w)
    keys, idx, mask = p.padded_batches()
    (xtx_b, xty_b), stats_b = jax.jit(jax.vmap(cvm.training_XTX_XTY))(
        jnp.asarray(idx), jnp.asarray(mask)
    )
    for i, k in enumerate(keys):
        (xtx, xty), _ = cvm.training_XTX_XTY(p.get_validation_indices(k))
        assert_allclose(np.asarray(xtx_b[i]), np.asarray(xtx), atol=1e-8)
        assert_allclose(np.asarray(xty_b[i]), np.asarray(xty), atol=1e-8)


def test_functional_api_jit_static_config():
    """The functional core jits with config static and state as a pytree arg."""
    from functools import partial

    from cvmatrix_tpu import CVConfig

    cfg = CVConfig(True, False, True, False, ddof=0)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    f = jax.jit(partial(training_XTX_XTY, cfg))
    p = Partitioner(FOLDS)
    vi = jnp.asarray(p.get_validation_indices(1))
    (xtx_j, xty_j), _ = f(st, vi)
    (xtx_e, xty_e), _ = training_XTX_XTY(cfg, st, vi)
    assert_allclose(np.asarray(xtx_j), np.asarray(xtx_e), atol=1e-12)
    assert_allclose(np.asarray(xty_j), np.asarray(xty_e), atol=1e-12)


def test_fit_jits():
    """fit() itself is jittable (weights validation skipped under trace)."""
    from functools import partial

    from cvmatrix_tpu import CVConfig

    cfg = CVConfig()
    st = jax.jit(partial(fit, cfg))(X_ALL[:, :5], Y_ALL, WEIGHTS)
    st_e = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    assert_allclose(np.asarray(st.XTX), np.asarray(st_e.XTX), atol=1e-10)
    assert_allclose(np.asarray(st.sum_w), np.asarray(st_e.sum_w))


def test_fused_jit_fit_plus_fold_with_concrete_indices():
    """jit(fit + fold) with host-constant fold indices must trace: the
    eager validity raises read the STATE's weight scalars too, so the
    check must defer whenever the state is traced (round-3 review
    finding: bool(tracer) crashed the fused trace)."""
    import numpy as np

    from cvmatrix_tpu import CVConfig, fit, training_matrices
    from cvmatrix_tpu.core.fold import training_statistics

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    rng = np.random.default_rng(3)
    X, Y, w = rng.random((60, 4)), rng.random((60, 2)), rng.random(60)
    v = np.arange(5)  # concrete

    fused = jax.jit(
        lambda x, y, ww: training_matrices(
            cfg, fit(cfg, x, y, ww, validate=False), v))
    (xtx, xty), _ = fused(X, Y, w)
    assert xtx.shape == (4, 4)
    ref = training_matrices(cfg, fit(cfg, X, Y, w), v)
    np.testing.assert_allclose(np.asarray(xtx), np.asarray(ref[0][0]),
                               atol=1e-10)

    stats = jax.jit(
        lambda x, y, ww: training_statistics(
            cfg, fit(cfg, x, y, ww, validate=False), v))(X, Y, w)
    assert stats[0].shape == (1, 4)
