"""Static HBM accounting for the wide-K genomics programs (config #4).

The axon device exposes no runtime ``memory_stats()`` (the
``hbm_peak_gb`` field in widek_genomics.json is null), so this records
the COMPILER's memory analysis instead: argument/output/temp/alias sizes
of the two programs the benchmark runs — the fit contraction and the
donated-state CV reduce sweep — lowered for the attached TPU. Compiles
hit the persistent cache when widek_genomics.py ran first.

Writes benchmarks/widek_memstats.json. Fields are bytes from
``jax.stages.Compiled.memory_analysis()``; ``fit_total_gb`` /
``sweep_total_gb`` = (arguments + outputs + temps) — an upper bound on
resident HBM per program (arguments may alias donated inputs).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from cvmatrix_tpu import CVConfig, Partitioner, fit
from cvmatrix_tpu.utils import enable_persistent_cache

enable_persistent_cache()
from cvmatrix_tpu.models.sweep import cross_validate_reduce

N, K, M, P = 5000, 20000, 1, 10
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)


def analysis_dict(compiled):
    try:
        ma = compiled.memory_analysis()
    except Exception as e:  # axon backend may not surface the analysis
        return {"error": repr(e)}
    if ma is None:
        return {"error": "memory_analysis() returned None"}
    out = {}
    for f in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, f, None)
        if v is not None:
            out[f] = int(v)
    return out


def total_gb(d):
    keys = ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes")
    if not all(k in d for k in keys):
        return None
    return round(sum(d[k] for k in keys) / 2**30, 3)


rng = np.random.default_rng(0)
X, Y = rng.random((N, K)), rng.random((N, M))
Xd, Yd = jnp.asarray(X), jnp.asarray(Y)

jfit = jax.jit(lambda x, y: fit(cfg, x, y, None, validate=False))
print("lowering fit...", file=sys.stderr, flush=True)
fit_c = jfit.lower(Xd, Yd).compile()
fit_ma = analysis_dict(fit_c)

state = jfit(Xd, Yd)
jax.block_until_ready(state.XTX)

p = Partitioner(np.arange(N) % P)
_, idx, mask = p.padded_batches()
idx_d = jnp.asarray(idx)
mask_d = None if mask is None else jnp.asarray(mask)


def consume(mats, stats):
    xtx, xty = mats
    return {"diag_mean": jnp.mean(jnp.diagonal(xtx)), "xty0": xty[:, 0]}


def sweep(st, ic, mc):
    return cross_validate_reduce(cfg, st, ic, mc, reduce_fn=consume,
                                 batch_size=1)


jsweep = jax.jit(sweep, donate_argnums=(0,))
print("lowering sweep...", file=sys.stderr, flush=True)
sweep_c = jsweep.lower(state, idx_d, mask_d).compile()
sweep_ma = analysis_dict(sweep_c)

row = {
    "N": N, "K": K, "M": M, "P": P, "dtype": "float64", "config": "TTTT",
    "platform": jax.devices()[0].platform,
    "fit": fit_ma, "fit_total_gb": total_gb(fit_ma),
    "sweep_donated": sweep_ma, "sweep_total_gb": total_gb(sweep_ma),
    "note": "compiler memory analysis (upper bound on resident HBM per "
            "program; donated arguments alias). Runtime memory_stats() "
            "is unavailable on the axon device.",
}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "widek_memstats.json")
with open(path, "w") as f:
    json.dump(row, f, indent=1)
print(json.dumps(row), flush=True)
print("WIDEK MEMSTATS OK", file=sys.stderr, flush=True)
