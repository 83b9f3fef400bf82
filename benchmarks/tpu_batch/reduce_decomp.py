"""Decompose the LOOCV reduce sweep's cost vs materialize on chip.

Seven legs at the headline shape (P=100k LOOCV, weighted TTTT f64)
separate the reduce sweep's overhead over the bare materialize
primitive into its parts:

  materialize           kernel + raw pair writes (the throughput leg)
  pairprobe             + scalar probe off the pair planes (custom loop)
  nostats_probe         + the pair->f64 conversion pass (custom loop,
                        scalar probe, NO stats code at all)
  reduce_probe_direct   public entry, probe = xtx[0,0]+xty[0,0] — the
                        loop computes stats the probe never reads
  reduce_probe_reshape  public entry, probe = reshape(-1)[0] — the
                        reshape of a sliced matrix forces a per-fold
                        copy (the form mesh_one_chip.py uses)
  reduce_stats          public entry, probe also consumes stats[0]
  reduce_fullsum        public entry, sums both matrices per fold

Each timing fetches a dependent scalar (honest barrier) and reports the
best of 2 warm repeats. Writes benchmarks/reduce_decomp.json.
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
from cvmatrix_tpu.utils import enable_persistent_cache

enable_persistent_cache()
from cvmatrix_tpu.models.sweep import cross_validate_reduce, materialize_sweep

N, K, M, P = 100_000, 500, 10, 100_000
rng = np.random.default_rng(42)
X = rng.random((N, K))
Y = rng.random((N, M))
w = rng.random(N)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
st = fit(cfg, X, Y, w, validate=False)
idx = np.arange(N)[:, None]
BS = 1000
idx_c = jnp.asarray(idx.reshape(P // BS, BS, 1))


def t(f):
    f()  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _custom_loop(with_convert):
    """materialize-shaped scan + optional conversion; scalar probe only."""
    from cvmatrix_tpu.core.batch import (
        _df64x2_enabled,
        _sym_enabled,
        loocv_from_sources,
        loocv_sym_from_sources,
        loocv_sym_tile,
        prepare_loocv_sources,
    )
    from cvmatrix_tpu.ops.df64 import df_to_f64

    def run(config, state, ic):
        n_chunks, bs = ic.shape[0], ic.shape[1]
        idxf = ic.reshape(n_chunks * bs, 1)
        src = prepare_loocv_sources(config, state, idxf, return_XTX=True,
                                    return_XTY=True, presplit=None)
        rows_all = idxf[:, 0].astype(jnp.int32)
        k = state.K
        c_full = k + state.M
        bt = loocv_sym_tile(src.kp) if _sym_enabled() else None

        def body(carry, c):
            ci = jax.lax.dynamic_slice_in_dim(rows_all, c * bs, bs, 0)
            sc = jax.lax.dynamic_slice_in_dim(src.scal, c * bs, bs, 0)
            if bt is not None:
                pair = loocv_sym_from_sources(config, src, ci, sc,
                                              return_XTY=True, bt=bt)
            else:
                pair = loocv_from_sources(
                    config, src, ci, sc, return_XTY=True,
                    two_per_step=_df64x2_enabled() and bs % 2 == 0,
                )
            if with_convert:
                out = df_to_f64(pair[:, 0, :k, :c_full],
                                pair[:, 1, :k, :c_full])
                red = out[:, 0, 0] + out[:, 0, k]
            else:
                red = pair[:, 0, 0, 0] + pair[:, 1, 0, 0]
            return carry, red

        _, red = jax.lax.scan(body, None,
                              jnp.arange(n_chunks, dtype=jnp.int32))
        return red

    return jax.jit(run, static_argnums=(0,))


probe_direct = lambda mats, stats: mats[0][0, 0] + mats[1][0, 0]
probe_reshape = lambda mats, stats: (
    mats[0].reshape(-1)[0] + mats[1].reshape(-1)[0]
)
probe_stats = lambda mats, stats: mats[0][0, 0] + jnp.sum(stats[0])
probe_full = lambda mats, stats: jnp.sum(mats[0]) + jnp.sum(mats[1])

jl_pair = _custom_loop(with_convert=False)
jl_conv = _custom_loop(with_convert=True)

legs = {}
for name, fn in (
    ("materialize_s",
     lambda: float(materialize_sweep(cfg, st, idx, batch_size=BS))),
    ("pairprobe_s", lambda: float(jl_pair(cfg, st, idx_c)[0, 0])),
    ("nostats_probe_s", lambda: float(jl_conv(cfg, st, idx_c)[0, 0])),
    ("reduce_probe_direct_s",
     lambda: float(cross_validate_reduce(
         cfg, st, idx, reduce_fn=probe_direct, batch_size=BS)[0])),
    ("reduce_probe_reshape_s",
     lambda: float(cross_validate_reduce(
         cfg, st, idx, reduce_fn=probe_reshape, batch_size=BS)[0])),
    ("reduce_stats_s",
     lambda: float(cross_validate_reduce(
         cfg, st, idx, reduce_fn=probe_stats, batch_size=BS)[0])),
    ("reduce_fullsum_s",
     lambda: float(cross_validate_reduce(
         cfg, st, idx, reduce_fn=probe_full, batch_size=BS)[0])),
):
    legs[name] = t(fn)
    print(name, legs[name], flush=True)

out = {
    "N": N, "K": K, "M": M, "P": P, "config": "TTTT", "dtype": "float64",
    "platform": jax.devices()[0].platform, "batch_size": BS,
    "legs": legs,
    "reading": [
        "pairprobe vs materialize: the fold kernel is the entire cost of "
        "both legs; probing the raw pair planes adds nothing.",
        "nostats_probe - pairprobe: the pair->f64 conversion pass, paid "
        "even when all but 2 of its 26M output elements are dead (XLA "
        "does not DCE the conversion behind the Pallas output).",
        "reduce_probe_direct - nostats_probe: the per-fold statistics "
        "recompute when the consumer ignores stats (any nonzero delta = "
        "failed DCE of the stats chain; its f64 arithmetic is "
        "X64-rewrite emulated on the VPU).",
        "reduce_probe_reshape - reduce_probe_direct: reshape(-1) of a "
        "sliced matrix forces a per-fold copy — consumer-side cost, "
        "avoidable by indexing instead of reshaping.",
        "reduce_fullsum: a consumer that actually reads both matrices "
        "per fold.",
    ],
}
path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "reduce_decomp.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("DECOMP OK", flush=True)
