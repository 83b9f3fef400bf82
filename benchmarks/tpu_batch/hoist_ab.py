"""A/B the round-5 hoisted reduce sweeps against the per-chunk body.

One leg per process (module-level jit caches bake routing; see
policy.py): run with CVMATRIX_TPU_HOIST_REDUCE=0 for the per-chunk leg
and unset/1 for the hoisted leg. Measures the public
cross_validate_reduce at the mesh_one_chip brackets (single chip,
indexing probe, best-of-2 warm) and MERGES its rows into
benchmarks/hoist_ab.json keyed by the leg name.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from cvmatrix_tpu import CVConfig, fit
from cvmatrix_tpu.policy import policy
from cvmatrix_tpu.utils import enable_persistent_cache

enable_persistent_cache()
from cvmatrix_tpu.models.sweep import cross_validate_reduce

N, K, M = 100_000, 500, 10
rng = np.random.default_rng(42)
X = rng.random((N, K))
Y = rng.random((N, M))
w = rng.random(N)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
st = fit(cfg, X, Y, w, validate=False)
BS = 1000

probe = lambda mats, stats: mats[0][0, 0] + mats[1][0, 0]
leg = "hoisted" if policy().hoist_reduce else "per_chunk"

rows = {}
for P in (1000, 10000, 100000):
    idx = np.stack(list(np.arange(N).reshape(P, N // P)))

    def run():
        return float(cross_validate_reduce(
            cfg, st, idx, reduce_fn=probe, batch_size=BS)[0])

    run()  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    rows[str(P)] = {"folds_s": round(best, 4),
                    "folds_per_sec": round(P / best, 1)}
    print(leg, P, rows[str(P)], flush=True)

path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "hoist_ab.json")
merged = {}
if os.path.exists(path):
    with open(path) as f:
        merged = json.load(f)
merged[leg] = {
    "N": N, "K": K, "M": M, "dtype": "float64", "config": "TTTT",
    "platform": jax.devices()[0].platform, "batch_size": BS,
    "brackets": rows,
}
with open(path, "w") as f:
    json.dump(merged, f, indent=1)
print("HOIST AB LEG OK", leg, flush=True)
