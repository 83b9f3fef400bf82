"""On-chip parity for the hoisted reduce-sweep routes (round 5).

Drives cross_validate_reduce (single chip) and
sharded_cross_validate_reduce (mesh of one) on the REAL TPU through the
packed small-fold route (L=5) and the v3 fused-Ozaki route (L=10), and
checks the reductions against the same sweeps on the host CPU XLA engine
(native f64 — the reference-grade comparison; the TPU xla route's f64
dot is only f32-accurate and is not a valid oracle). Contract: the
magnitude-scaled 1e-8 bound the test suite uses.

Writes benchmarks/reduce_parity_tpu.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from cvmatrix_tpu import CVConfig, fit
from cvmatrix_tpu.utils import enable_persistent_cache

enable_persistent_cache()
from cvmatrix_tpu.models.sweep import cross_validate_reduce
from cvmatrix_tpu.parallel.distributed import (
    make_mesh,
    sharded_cross_validate_reduce,
)

N, K, M = 20000, 500, 10
rng = np.random.default_rng(3)
X = rng.random((N, K))
Y = rng.random((N, M))
w = rng.random(N)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)


def probe(mats, stats):
    xtx, xty = mats
    return {
        "row0": xtx[0, :],
        "tr": jnp.trace(xtx),
        "ysum": jnp.sum(xty),
        "mX": stats[0][0, :8],
        "sX": stats[1][0, :8],
    }


def flat(out):
    return np.concatenate(
        [np.asarray(jax.device_get(v)).ravel() for v in out.values()]
    )


cpu0 = jax.devices("cpu")[0]
results = {}
for name, L, P in (("smallfold", 5, 100), ("v3", 10, 100)):
    idx = np.stack([rng.permutation(N)[:L] for _ in range(P)])

    # host CPU XLA reference (native f64)
    with jax.default_device(cpu0):
        st_h = fit(cfg, jax.device_put(X, cpu0), jax.device_put(Y, cpu0),
                   jax.device_put(w, cpu0), validate=False)
        ref = flat(cross_validate_reduce(
            cfg, st_h, jax.device_put(idx, cpu0), reduce_fn=probe,
            batch_size=25, impl="xla"))

    # TPU single-chip (auto -> pallas hoisted routes)
    st = fit(cfg, X, Y, w, validate=False)
    got = flat(cross_validate_reduce(
        cfg, st, idx, reduce_fn=probe, batch_size=25))

    # TPU mesh(1) (auto -> hoisted mesh programs)
    mesh = make_mesh(jax.devices()[:1])
    gotm = flat(sharded_cross_validate_reduce(
        cfg, st, idx, mesh=mesh, reduce_fn=probe, batch_size=25))

    scale = max(1.0, float(np.max(np.abs(ref))))
    d_single = float(np.max(np.abs(got - ref)))
    d_mesh = float(np.max(np.abs(gotm - ref)))
    results[name] = {
        "L": L, "P": P,
        "max_abs_d_single": d_single,
        "max_abs_d_mesh1": d_mesh,
        "ref_scale": scale,
        "rel_single": d_single / scale,
        "rel_mesh1": d_mesh / scale,
        "ok": bool(d_single < 1e-8 * scale and d_mesh < 1e-8 * scale),
    }
    print(name, json.dumps(results[name]), flush=True)

row = {
    "N": N, "K": K, "M": M, "dtype": "float64", "config": "TTTT",
    "platform": jax.devices()[0].platform,
    "contract": "1e-8 * max(1, |ref|_max), ref = host CPU XLA engine",
    "routes": results,
    "ok": bool(all(r["ok"] for r in results.values())),
}
out = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "reduce_parity_tpu.json")
with open(out, "w") as f:
    json.dump(row, f, indent=1)
print("REDUCE PARITY", "OK" if row["ok"] else "FAIL", flush=True)
sys.exit(0 if row["ok"] else 1)
