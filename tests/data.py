"""Synthetic test data.

The reference test-suite downloads a 26617x102 NIR grain dataset over HTTP at
import time (ref ``tests/load_data.py:28-69``). This environment has no
network egress, so we generate spectra-like synthetic data with the same
structural properties: smooth correlated columns (like NIR channels), a
multi-target Y, a 3-valued unequal 'split' fold column, and random weights
with a zeroed fraction.
"""

from __future__ import annotations

import numpy as np

SEED = 42


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


def zero_fraction(weights: np.ndarray, frac: float = 0.1, seed: int = SEED):
    """Randomly zero a fraction of the weights (ref test_cvmatrix.py:109-122)."""
    rng = np.random.default_rng(seed + 1)
    w = weights.copy()
    idx = rng.choice(w.size, size=int(frac * w.size), replace=False)
    w[idx] = 0.0
    return w


def train_indices(folds_dict: dict, fold) -> np.ndarray:
    return np.concatenate([v for k, v in folds_dict.items() if k != fold])
