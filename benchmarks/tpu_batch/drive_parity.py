"""TPU drive: f64 parity vs numpy naive recompute on the real chip."""
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from cvmatrix_tpu import CVMatrix, Partitioner

assert jax.devices()[0].platform != "cpu", jax.devices()
rng = np.random.default_rng(1)
N, K, M = 2000, 64, 3
X = rng.random((N, K))
Y = rng.random((N, M))
w = rng.random(N)
folds = np.arange(N) % 4

cvm = CVMatrix(True, True, True, True, ddof=1).fit(X, Y, w)
p = Partitioner(folds)
v0 = p.get_validation_indices(0)
(xtx, xty), _ = cvm.training_XTX_XTY(v0)

ti = np.setdiff1d(np.arange(N), v0)
Xt, Yt, wt = X[ti], Y[ti], w[ti]
mean_X = np.average(Xt, axis=0, weights=wt)
mean_Y = np.average(Yt, axis=0, weights=wt)
nnz = np.count_nonzero(wt)
divisor = (nnz - 1) * wt.sum() / nnz
std_X = np.sqrt(np.sum(wt[:, None] * (Xt - mean_X) ** 2, axis=0) / divisor)
std_Y = np.sqrt(np.sum(wt[:, None] * (Yt - mean_Y) ** 2, axis=0) / divisor)
Xc = (Xt - mean_X) / std_X
Yc = (Yt - mean_Y) / std_Y
ex = np.max(np.abs(np.asarray(xtx) - (Xc * wt[:, None]).T @ Xc))
ey = np.max(np.abs(np.asarray(xty) - (Xc * wt[:, None]).T @ Yc))
print(f"TPU f64 parity: max|dXTX|={ex:.3e} max|dXTY|={ey:.3e}")
assert ex < 1e-8 and ey < 1e-8
print("TPU DRIVE OK")
