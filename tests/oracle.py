"""Independent NumPy oracle: naive per-fold recomputation from scratch.

This is the numerical contract for the whole framework (the same role
``tests/naive_cvmatrix.py`` plays for the reference): for a fold given by its
*training* indices, materialise the training rows, apply weighted
centering/scaling computed on those rows, and form the products directly.
The fast engine must agree with this at atol 1e-8 across all 16
center/scale combinations x {weights, none} x ddof x {Y, none}.

Written directly from the definitions (weighted mean; weighted std with
divisor ``(nnz - ddof) * sum_w / nnz``; stds <= resolution replaced by 1,
matching reference semantics at ``cvmatrix/cvmatrix.py:187, 1045-1128``) —
not from the reference's code structure.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["NaiveOracle"]


class NaiveOracle:
    """Slow, obviously-correct recompute-from-scratch implementation."""

    def __init__(
        self,
        center_X: bool = True,
        center_Y: bool = True,
        scale_X: bool = True,
        scale_Y: bool = True,
        ddof: int = 1,
        dtype=np.float64,
        fast_weight_computation: bool = True,
    ) -> None:
        self.center_X = center_X
        self.center_Y = center_Y
        self.scale_X = scale_X
        self.scale_Y = scale_Y
        self.ddof = ddof
        self.dtype = np.dtype(dtype).type
        self.resolution = np.finfo(dtype).resolution * 10
        # False: apply weights via an explicit diag(w) matmul instead of a
        # Hadamard product — the reference oracle's alternative path
        # (``tests/naive_cvmatrix.py:144-145, 255-262``), used to assert the
        # two weightings are the same linear operator.
        self.fast_weight_computation = fast_weight_computation
        self.X = self.Y = self.w = None

    def fit(self, X, Y=None, weights=None) -> "NaiveOracle":
        def prep(a):
            a = np.asarray(a, dtype=self.dtype)
            return a.reshape(-1, 1) if a.ndim == 1 else a

        self.X = prep(X)
        self.Y = None if Y is None else prep(Y)
        self.w = None if weights is None else prep(weights)
        if self.w is not None and np.any(self.w < 0):
            raise ValueError("Weights must be non-negative.")
        return self

    # ------------------------------------------------------------------ #

    def _weighted_mean(self, mat, w):
        if w is None:
            return np.mean(mat, axis=0, keepdims=True)
        return np.sum(w * mat, axis=0, keepdims=True) / np.sum(w)

    def _weighted_std(self, mat, mean, w, nnz):
        if w is None:
            n = mat.shape[0]
            sum_w = self.dtype(n)
        else:
            sum_w = np.sum(w)
        divisor = (nnz - self.ddof) * sum_w / nnz
        ww = np.ones((mat.shape[0], 1), dtype=self.dtype) if w is None else w
        var = np.sum(ww * (mat - mean) ** 2, axis=0, keepdims=True) / divisor
        std = np.sqrt(var)
        std = np.where(np.abs(std) <= self.resolution, 1.0, std)
        return std

    def training_matrices(
        self,
        training_indices,
        *,
        return_XTX: bool = True,
        return_XTY: bool = True,
    ) -> Tuple:
        """Training matrices + stats, recomputed from the training rows."""
        if not return_XTX and not return_XTY:
            raise ValueError(
                "At least one of `return_XTX` and `return_XTY` must be True."
            )
        if return_XTY and self.Y is None:
            raise ValueError("Response variables `Y` are not provided.")
        ti = np.asarray(training_indices)
        Xt = self.X[ti]
        w = None if self.w is None else self.w[ti]

        any_stats = (
            self.center_X
            or self.scale_X
            or (return_XTY and (self.center_Y or self.scale_Y))
        )
        if w is not None and any_stats:
            nnz = self.dtype(np.count_nonzero(w))
            if nnz == 0:
                raise ValueError(
                    "The number of non-zero weights in the training set must "
                    "be greater than zero."
                )
        else:
            nnz = self.dtype(Xt.shape[0])
        if (self.scale_X or (return_XTY and self.scale_Y)) and nnz <= self.ddof:
            raise ValueError(
                "The number of non-zero weights in the training set must be "
                "greater than `ddof`."
            )

        X_mean = X_std = Y_mean = Y_std = None
        Xp = Xt
        if self.center_X or self.scale_X:
            X_mean = self._weighted_mean(Xt, w)
        if self.center_X:
            Xp = Xp - X_mean
        if self.scale_X:
            X_std = self._weighted_std(
                Xp, 0.0 if self.center_X else X_mean, w, nnz
            )
            Xp = Xp / X_std

        Yp = None
        if return_XTY:
            Yt = self.Y[ti]
            Yp = Yt
            if self.center_Y or self.scale_Y:
                Y_mean = self._weighted_mean(Yt, w)
            if self.center_Y:
                Yp = Yp - Y_mean
            if self.scale_Y:
                Y_std = self._weighted_std(
                    Yp, 0.0 if self.center_Y else Y_mean, w, nnz
                )
                Yp = Yp / Y_std

        if w is None:
            XtW = Xp.T
        elif self.fast_weight_computation:
            XtW = Xp.T * w.T
        else:
            XtW = Xp.T @ np.diag(w.reshape(-1))
        stats = (
            X_mean if (self.center_X or self.scale_X) else None,
            X_std if self.scale_X else None,
            Y_mean if (return_XTY and (self.center_Y or self.scale_Y)) else None,
            Y_std if (return_XTY and self.scale_Y) else None,
        )
        if return_XTX and return_XTY:
            return (XtW @ Xp, XtW @ Yp), stats
        if return_XTX:
            return XtW @ Xp, stats
        return XtW @ Yp, stats

    def training_XTX(self, training_indices):
        return self.training_matrices(
            training_indices, return_XTX=True, return_XTY=False
        )

    def training_XTY(self, training_indices):
        return self.training_matrices(
            training_indices, return_XTX=False, return_XTY=True
        )

    def training_XTX_XTY(self, training_indices):
        return self.training_matrices(
            training_indices, return_XTX=True, return_XTY=True
        )
