"""Synthetic test data.

The reference test-suite downloads a 26617x102 NIR grain dataset over HTTP at
import time (ref ``tests/load_data.py:28-69``). This environment has no
network egress, so we generate spectra-like synthetic data with the same
structural properties: smooth correlated columns (like NIR channels), a
multi-target Y, a 3-valued unequal 'split' fold column, and random weights
with a zeroed fraction.
"""

from __future__ import annotations

import os

import numpy as np

SEED = 42

# The reference's real NIR grain dataset (26617x102 spectra + 10 ground-truth
# columns + a 3-valued 'split'), csv/npz layout as published at
# github.com/Sm00thix/IKPLSTestData (ref ``tests/load_data.py:28-69``).
# Protein/Moisture lead so ``Y[:, :2]`` are the natural regression targets
# (the columns the reference tests regress on, ref ``test_cvmatrix.py:48-49``).
NIR_VALUE_COLS = [
    "Protein", "Moisture", "Rye_Midsummer", "Wheat_H1", "Wheat_H3",
    "Wheat_H4", "Wheat_H5", "Wheat_Halland", "Wheat_Oland", "Wheat_Spelt",
]


def load_real_nir():
    """Load the reference's real NIR dataset from local files, if pointed to.

    This environment has no network egress, so instead of downloading
    (ref ``tests/load_data.py:31-69``) the loader reads local copies:

    - ``CVMATRIX_TPU_NIR_CSV``: path to ``dataset.csv`` (11 ground-truth
      columns incl. ``split``).
    - ``CVMATRIX_TPU_NIR_SPECTRA``: path to ``spectra.npz`` (reflectance
      spectra; stacked and ``-log10``-transformed exactly like the
      reference). Defaults to ``spectra.npz`` next to the csv.

    Returns ``(X, Y, folds, weights)`` — weights are synthetic (the real
    dataset has none; the reference tests also draw random weights,
    ref ``test_cvmatrix.py:109-122``) — or ``None`` when the env var is
    unset (the synthetic fallback path).
    """
    csv_path = os.environ.get("CVMATRIX_TPU_NIR_CSV")
    if not csv_path:
        return None
    spectra_path = os.environ.get(
        "CVMATRIX_TPU_NIR_SPECTRA",
        os.path.join(os.path.dirname(csv_path) or ".", "spectra.npz"),
    )
    npz = np.load(spectra_path)
    spectra = np.vstack([npz[k] for k in npz.keys()]).astype(np.float64)
    X = -np.log10(spectra)  # reflectance -> pseudo absorbance (ref :69)
    table = np.genfromtxt(csv_path, delimiter=",", names=True)
    Y = np.stack([table[c].astype(np.float64) for c in NIR_VALUE_COLS], axis=1)
    folds = table["split"].astype(int)
    if X.shape[0] != Y.shape[0]:
        raise ValueError(
            f"NIR spectra rows ({X.shape[0]}) != csv rows ({Y.shape[0]})"
        )
    weights = np.random.default_rng(SEED).random(X.shape[0])
    return X, Y, folds, weights


def nir_dataset(m: int = 10):
    """Real NIR data when ``CVMATRIX_TPU_NIR_CSV`` is set, else synthetic.

    The differential suites (``tests/test_realscale.py``) and the benchmark
    harness (``BENCH_DATA=nir``) call this, so pointing the env var at a
    local copy of the dataset runs the identical parity lattice on the real
    distribution — the opt-in the egress-free default cannot provide.
    """
    real = load_real_nir()
    if real is not None:
        X, Y, folds, weights = real
        return X, Y[:, :m], folds, weights
    return make_nir_like_dataset(m=m)


def make_dataset(n: int = 600, k: int = 8, m: int = 2, seed: int = SEED):
    rng = np.random.default_rng(seed)
    # Smooth "spectra": random walk across columns plus per-row offset/slope.
    base = np.cumsum(rng.normal(size=(n, k)), axis=1) * 0.05
    offset = rng.normal(size=(n, 1))
    slope = rng.normal(size=(n, 1)) * np.linspace(0, 1, k)[None, :]
    X = 1.0 + 0.2 * base + 0.5 * offset + slope
    Y = np.stack(
        [
            X @ rng.normal(size=k) + rng.normal(size=n) * 0.1,
            10.0 + X @ rng.normal(size=k) * 0.3 + rng.normal(size=n) * 0.05,
        ],
        axis=1,
    )[:, :m]
    # 3 unequal folds (like the reference dataset's 'split' column).
    folds = rng.choice([0, 1, 2], size=n, p=[0.5, 0.3, 0.2])
    weights = rng.random(n)
    return X, Y, folds, weights


_NIR_CACHE: dict = {}


def make_nir_like_dataset(n: int = 26617, k: int = 102, m: int = 10,
                          seed: int = SEED):
    """Deterministic synthetic analogue of the reference's NIR grain dataset.

    The reference suite downloads 26617x102 NIR spectra with 10 targets and
    a 3-valued ``split`` column over HTTP (ref ``tests/load_data.py:28-69``,
    used at ``tests/test_cvmatrix.py:48-49, 544-549``); this environment has
    no egress, so we synthesise data with the same structure and scale:

    - X: absorbance-like spectra ``-log10(reflectance)`` where reflectance
      is a smooth positive curve per row (Gaussian bands on a gentle
      baseline, like grain NIR channels) — columns are strongly correlated,
      values O(0.1..1), exactly the conditioning regime of the real data.
    - Y: 10 targets (2 composition-like columns correlated with band
      depths + 8 noisier auxiliaries), like Protein/Moisture + extras.
    - split: 3 unequal natural folds (the dataset's packaging plants).

    Results are memoised per (n, k, m, seed) — the suite imports this from
    several modules.
    """
    key = (n, k, m, seed)
    if key not in _NIR_CACHE:
        rng = np.random.default_rng(seed + 7)
        wl = np.linspace(0.0, 1.0, k)[None, :]
        refl = 0.35 + 0.25 * np.exp(
            -((wl - 0.5) ** 2) / 0.18
        ) + 0.05 * wl  # shared instrument baseline
        refl = np.broadcast_to(refl, (n, k)).copy()
        centers = rng.uniform(0.1, 0.9, size=(6,))
        widths = rng.uniform(0.003, 0.03, size=(6,))
        depths = rng.random((n, 6)) * np.array([0.2, 0.15, 0.1, 0.1, 0.05,
                                                0.05])
        for b in range(6):
            refl -= depths[:, b : b + 1] * np.exp(
                -((wl - centers[b]) ** 2) / widths[b]
            )
        refl *= 1.0 + 0.08 * rng.normal(size=(n, 1))  # multiplicative scatter
        refl += 0.002 * rng.normal(size=(n, k))  # detector noise
        X = -np.log10(np.clip(refl, 1e-3, None))
        comp = depths[:, :2] @ np.array([[9.0, 1.0], [1.5, 12.0]])
        aux = depths @ rng.normal(size=(6, m - 2)) + 0.1 * rng.normal(
            size=(n, m - 2)
        )
        Y = np.concatenate([10.0 + comp, aux], axis=1)[:, :m]
        folds = rng.choice([0, 1, 2], size=n, p=[0.45, 0.35, 0.2])
        weights = rng.random(n)
        _NIR_CACHE[key] = (X, Y, folds, weights)
    return _NIR_CACHE[key]


def zero_fraction(weights: np.ndarray, frac: float = 0.1, seed: int = SEED):
    """Randomly zero a fraction of the weights (ref test_cvmatrix.py:109-122)."""
    rng = np.random.default_rng(seed + 1)
    w = weights.copy()
    idx = rng.choice(w.size, size=int(frac * w.size), replace=False)
    w[idx] = 0.0
    return w


def train_indices(folds_dict: dict, fold) -> np.ndarray:
    return np.concatenate([v for k, v in folds_dict.items() if k != fold])
