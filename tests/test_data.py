"""Tests for the test-data loaders, incl. the real-NIR local-file hook.

The reference suite downloads the NIR grain dataset over HTTP
(ref ``tests/load_data.py:28-69``); this egress-free environment instead
accepts local copies via ``CVMATRIX_TPU_NIR_CSV`` / ``_SPECTRA`` (see
``tests/data.py:load_real_nir``). These tests pin the hook's parsing —
column order, the ``-log10`` transform, the synthetic fallback — with a
tiny fabricated dataset of the same file layout.
"""

import numpy as np
import pytest

from .data import NIR_VALUE_COLS, load_real_nir, make_nir_like_dataset, nir_dataset


def _write_fake_nir(tmp_path, n=7, k=5):
    rng = np.random.default_rng(3)
    refl = rng.uniform(0.2, 0.9, size=(n, k))
    # spectra.npz holds reflectance in several stacked arrays (the loader
    # vstacks them in key order, like the reference's load_spectra).
    np.savez(tmp_path / "spectra.npz", a=refl[:4], b=refl[4:])
    cols = ["Rye_Midsummer", "Wheat_H1", "Wheat_H3", "Wheat_H4", "Wheat_H5",
            "Wheat_Halland", "Wheat_Oland", "Wheat_Spelt", "Moisture",
            "Protein", "split"]
    vals = rng.random((n, len(cols)))
    vals[:, -1] = np.arange(n) % 3
    csv = tmp_path / "dataset.csv"
    with open(csv, "w") as f:
        f.write(",".join(cols) + "\n")
        for row in vals:
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")
    return csv, refl, vals, cols


def test_load_real_nir_unset_returns_none(monkeypatch):
    monkeypatch.delenv("CVMATRIX_TPU_NIR_CSV", raising=False)
    assert load_real_nir() is None


def test_load_real_nir_parses_local_files(tmp_path, monkeypatch):
    csv, refl, vals, cols = _write_fake_nir(tmp_path)
    monkeypatch.setenv("CVMATRIX_TPU_NIR_CSV", str(csv))
    X, Y, folds, w = load_real_nir()
    # -log10 reflectance->absorbance, stacked in npz key order
    np.testing.assert_allclose(X, -np.log10(refl), atol=1e-12)
    # Y columns follow NIR_VALUE_COLS (Protein/Moisture first)
    for j, name in enumerate(NIR_VALUE_COLS):
        np.testing.assert_allclose(
            Y[:, j], np.round(vals[:, cols.index(name)], 6), atol=1e-12)
    assert folds.tolist() == (np.arange(len(folds)) % 3).tolist()
    assert w.shape == (X.shape[0],) and (w >= 0).all()

    # nir_dataset routes through the real data when the env var is set...
    X2, Y2, _, _ = nir_dataset(m=2)
    np.testing.assert_array_equal(X2, X)
    np.testing.assert_array_equal(Y2, Y[:, :2])


def test_load_real_nir_row_mismatch_raises(tmp_path, monkeypatch):
    csv, refl, _, _ = _write_fake_nir(tmp_path)
    np.savez(tmp_path / "spectra.npz", a=refl[:3])  # too few spectra rows
    monkeypatch.setenv("CVMATRIX_TPU_NIR_CSV", str(csv))
    with pytest.raises(ValueError, match="rows"):
        load_real_nir()


def test_nir_dataset_synthetic_fallback(monkeypatch):
    monkeypatch.delenv("CVMATRIX_TPU_NIR_CSV", raising=False)
    X, Y, folds, w = nir_dataset(m=3)
    Xs, Ys, foldss, ws = make_nir_like_dataset(m=3)
    np.testing.assert_array_equal(X, Xs)
    np.testing.assert_array_equal(Y, Ys)
