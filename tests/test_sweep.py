"""High-level sweep driver: full coverage, both batching modes."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from cvmatrix_tpu import CVConfig, CVMatrix, Partitioner, fit
from cvmatrix_tpu.models.sweep import cross_validate, cross_validate_dict

from .data import make_dataset

X_ALL, Y_ALL, FOLDS, WEIGHTS = make_dataset()


@pytest.mark.parametrize("use_padding", [False, True])
def test_sweep_matches_eager(use_padding):
    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    ref = CVMatrix().fit(X_ALL[:, :5], Y_ALL, WEIGHTS)
    p = Partitioner(FOLDS)
    results = cross_validate_dict(cfg, st, p, use_padding=use_padding)
    assert set(results) == set(p.folds_dict)
    for k, ((xtx, xty), stats) in results.items():
        (rx, ry), rstats = ref.training_XTX_XTY(p.get_validation_indices(k))
        assert_allclose(np.asarray(xtx), np.asarray(rx), atol=1e-10)
        assert_allclose(np.asarray(xty), np.asarray(ry), atol=1e-10)
        for a, b in zip(stats, rstats):
            if b is not None:
                assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_sweep_chunking_covers_all_folds():
    cfg = CVConfig(False, False, False, False, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    p = Partitioner(np.arange(X_ALL.shape[0]) % 97)  # LOOCV-ish, many folds
    seen = []
    for keys, out in cross_validate(cfg, st, p, batch_size=10):
        seen.extend(keys)
        assert out[0][0].shape[0] == len(keys)
    assert sorted(seen) == sorted(p.folds_dict)


def test_sweep_xtx_only():
    cfg = CVConfig(True, False, True, False, 1)
    st = fit(cfg, X_ALL[:, :5], None, None)
    p = Partitioner(FOLDS)
    d = cross_validate_dict(cfg, st, p, return_XTY=False)
    ref = CVMatrix(True, False, True, False, 1).fit(X_ALL[:, :5], None, None)
    for k, (xtx, stats) in d.items():
        rx, _ = ref.training_XTX(p.get_validation_indices(k))
        assert_allclose(np.asarray(xtx), np.asarray(rx), atol=1e-10)
