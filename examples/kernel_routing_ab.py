"""In-process kernel-routing A/B with ``set_routing``.

The engine auto-routes every fold sweep; the defaults are the measured
winners and there is nothing to configure in normal use (reference bar:
one engine, 8 constructor knobs — ref ``cvmatrix/cvmatrix.py:157-167``).
For measurement work, :func:`cvmatrix_tpu.set_routing` swaps a routing
decision mid-process and clears the package's compiled-program caches,
so the next call honestly re-traces under the new policy — no
env-var + fresh-process dance.

Runs anywhere (CPU included; the Pallas-only knobs simply don't change
the route off-TPU). On a TPU, time both variants with a real workload.
"""

import time

import numpy as np

from cvmatrix_tpu import CVConfig, fit, policy, set_routing
from cvmatrix_tpu.models.sweep import materialize_sweep

N, K, M, P = 20_000, 64, 4, 100

rng = np.random.default_rng(0)
X = rng.random((N, K))
Y = rng.random((N, M))
w = rng.random(N)

cfg = CVConfig(center_X=True, center_Y=True, scale_X=True, scale_Y=True,
               ddof=1, dtype=np.float64)
state = fit(cfg, X, Y, w)
idx = np.arange(N).reshape(P, N // P)


def timed_sweep(label):
    probe = float(materialize_sweep(cfg, state, idx))  # compile + warm
    t0 = time.perf_counter()
    probe = float(materialize_sweep(cfg, state, idx))
    print(f"{label:28s} {time.perf_counter() - t0:8.4f} s  probe={probe:.6f}")
    return probe


print("active policy:", policy())
base = timed_sweep("default routing")

set_routing(df64x2=True)  # two-folds-per-grid-step df64 LOOCV kernel
variant = timed_sweep("df64x2 two-folds-per-step")

set_routing(df64x2=False)  # restore
assert abs(base - variant) <= 1e-9 * max(1.0, abs(base)), "routing changed the numbers!"
print("parity OK: both routes produce the same probe")
