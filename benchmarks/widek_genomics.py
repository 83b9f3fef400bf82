"""Wide-genomics benchmark: N=5k, K=20k, XTX-bound (BASELINE.json config 4).

The fit is the exact int8-slice (Ozaki) contraction on the MXU; the 10-fold
CV routes through the MXU downdate-product + double-float epilogue kernel
with device-resident consumption (cross_validate_reduce) and a donated
state — a 20000 x 20000 float64 training matrix is 3.2 GB, so per-fold
matrices are consumed on device rather than materialised en masse.

Writes benchmarks/widek_genomics.json (merging one entry per routing
variant, keyed ``default``/``syrk``) including the device HBM peak — the
recorded evidence behind the "K=20k fits and cross-validates on one 16 GB
chip" claim (CHANGELOG 0.2.0).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from cvmatrix_tpu import CVConfig, Partitioner, fit
from cvmatrix_tpu.utils import enable_persistent_cache
enable_persistent_cache()  # retry resilience: crashed runs reuse compiles
from cvmatrix_tpu.models.sweep import cross_validate_reduce
from cvmatrix_tpu.policy import policy

def log(*a): print(*a, file=sys.stderr, flush=True)

def hbm_peak_gb():
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if not stats or "peak_bytes_in_use" not in stats:
        return None
    return round(stats["peak_bytes_in_use"] / 2**30, 3)

N, K, M, P = 5000, 20000, 1, 10
rng = np.random.default_rng(0)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
X, Y, w = rng.random((N, K)), rng.random((N, M)), None  # unweighted: X aliases WX (HBM)

jfit = jax.jit(lambda c, x, y, ww: fit(c, x, y, ww, validate=False),
               static_argnums=(0,))
Xd, Yd = jnp.asarray(X), jnp.asarray(Y)  # ship to device ONCE
t0 = time.perf_counter()
state = jfit(cfg, Xd, Yd, None)
float(state.XTX[0, 0])
log(f"fit compile+run {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter()
state = None
state = jfit(cfg, Xd, Yd, None)
float(state.XTX[0, 0])
t_fit = time.perf_counter() - t0
log(f"warm fit {t_fit:.3f}s")

p = Partitioner(np.arange(N) % P)
keys, idx, mask = p.padded_batches()

def consume(mats, stats):
    xtx, xty = mats
    # device-resident consumption: diagonal + first row of the solve target
    return {"diag_mean": jnp.mean(jnp.diagonal(xtx)), "xty0": xty[:, 0]}

# Spot check vs the XLA engine on one fold BEFORE donating the state.
# On the HOST backend: the TPU XLA fold path at K=20k materialises
# several 20480^2 f32 slice-group temps (measured 28 G > 15.75 G HBM),
# while CPU runs the same engine with native f64 — the reference-grade
# comparison anyway. The fitted state transfers as its f64 values.
cpu0 = jax.devices("cpu")[0]
state_h = jax.device_put(state, cpu0)
with jax.default_device(cpu0):
    o2 = cross_validate_reduce(cfg, state_h,
                               jax.device_put(idx[:1], cpu0),
                               None if mask is None
                               else jax.device_put(mask[:1], cpu0),
                               reduce_fn=consume, batch_size=1, impl="xla")
    xla_diag = float(o2["diag_mean"][0])
o2 = state_h = None

t0 = time.perf_counter()
out = cross_validate_reduce(cfg, state, idx, mask, reduce_fn=consume,
                            batch_size=1, donate_state=True)
ref_diag = float(out["diag_mean"][0])
log(f"reduce sweep compile+run {time.perf_counter()-t0:.1f}s (state consumed)")
d = abs(ref_diag - xla_diag)
log(f"pallas vs xla diag_mean |d|={d:.3e}")
assert d < 1e-6

# refit (state was donated), then a warm donated sweep for honest timing
state = None
out = None
state = jfit(cfg, Xd, Yd, None)
float(state.XTX[0, 0])
t0 = time.perf_counter()
out = cross_validate_reduce(cfg, state, idx, mask, reduce_fn=consume,
                            batch_size=1, donate_state=True)
float(out["diag_mean"][0])
t_folds = time.perf_counter() - t0
log(f"warm: fit={t_fit:.3f}s folds={t_folds:.3f}s "
    f"({P/(t_fit+t_folds):.2f} folds/s at K=20k)")

variant = "syrk" if policy().batch_syrk else "default"
row = {
    "N": N, "K": K, "M": M, "P": P, "dtype": "float64",
    "config": "TTTT", "platform": jax.devices()[0].platform,
    "batch_syrk": policy().batch_syrk,
    "warm_fit_s": round(t_fit, 3), "warm_folds_s": round(t_folds, 3),
    "folds_per_sec": round(P / (t_fit + t_folds), 3),
    "pallas_vs_xla_diag_abs_d": d,
    "hbm_peak_gb": hbm_peak_gb(),
}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "widek_genomics.json")
merged = {}
if os.path.exists(path):
    with open(path) as f:
        merged = json.load(f)
merged[variant] = row
with open(path, "w") as f:
    json.dump(merged, f, indent=1)
print(json.dumps({variant: row}), flush=True)
log("WIDEK OK")
