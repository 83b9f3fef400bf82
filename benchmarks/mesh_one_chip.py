"""Mesh-of-one vs single-chip fold throughput on the real TPU.

VERDICT follow-up: the mesh fold path must not cost throughput when the
mesh is trivial. Runs the same fold sweep three ways on ONE real chip —

  1. single-chip materialize: ``materialize_sweep`` (the benchmark
     primitive; kernel-routed fold math, single completion barrier) —
     matrices are produced but not consumed,
  2. single-chip reduce: ``cross_validate_reduce`` with the probe
     ``reduce_fn`` — same per-chunk work CLASS as the mesh path (f64
     matrices + per-fold statistics + an on-device reduction), and
  3. mesh(1): ``sharded_cross_validate_reduce`` over a 1-device
     ``jax.sharding.Mesh``.

``mesh1_over_single_reduce`` (same workload, mesh on vs off) is the mesh
overhead; ``mesh1_over_single`` (vs materialize) is kept for continuity
but conflates mesh cost with reduce-sweep semantics — a reduce sweep
converts the kernels' raw double-float pairs to f64 and computes the
per-fold statistics the reduce_fn is handed, a full extra HBM pass the
materialize primitive never pays (round-5 finding: the recorded 3.6-3.8x
"mesh overhead" at P=100k was mostly THIS, not the mesh). Together with
``benchmarks/mesh_scaling.py`` (virtual-CPU-mesh scaling proxy) this
bounds the mesh overhead at both ends without multi-chip hardware.

Writes benchmarks/mesh_one_chip.json. P values via BENCH_PS
(default "1000,10000" — the MXU-product and packed-kernel fold bands).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from cvmatrix_tpu.utils import enable_persistent_cache

    enable_persistent_cache()  # retry resilience: crashed runs reuse compiles

    from cvmatrix_tpu import CVConfig, Partitioner, fit
    from cvmatrix_tpu.models.sweep import cross_validate_reduce, materialize_sweep
    from cvmatrix_tpu.parallel.distributed import (
        make_mesh,
        sharded_cross_validate_reduce,
    )

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    Ps = [int(x) for x in os.environ.get("BENCH_PS", "1000,10000").split(",")]

    rng = np.random.default_rng(42)
    X = rng.random((N, K))
    Y = rng.random((N, M))
    w = rng.random(N)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    state = fit(cfg, X, Y, w, validate=False)
    mesh = make_mesh(jax.devices()[:1])

    def probe_reduce(mats, stats):
        xtx, xty = mats
        # Index, don't reshape: reshape(-1) of a sliced matrix forces a
        # per-fold copy (+0.85 s at P=1e5 — benchmarks/reduce_decomp.json),
        # which inflated the recorded reduce legs by ~2x in earlier rounds.
        return xtx[0, 0] + xty[0, 0]

    # One chunk geometry for both reduce legs (the mesh auto-sizer picks
    # ~1000 at the bench shape; cross_validate_reduce defaults to 512 —
    # pin both so the ratio measures the mesh, not the chunking).
    BS = int(os.environ.get("BENCH_BATCH", 1000))

    rows = []
    for P in Ps:
        part = Partitioner(np.arange(N) % P)
        idx = np.stack(list(part.folds_dict.values()))

        def single():
            return float(materialize_sweep(cfg, state, idx))

        def single_reduce():
            out = cross_validate_reduce(
                cfg, state, idx, reduce_fn=probe_reduce, batch_size=BS,
            )
            return float(out[0])

        def mesh1():
            out = sharded_cross_validate_reduce(
                cfg, state, idx, mesh=mesh, reduce_fn=probe_reduce,
                batch_size=BS,
            )
            return float(out[0])

        single(); single_reduce(); mesh1()  # compile + warm all programs
        t0 = time.perf_counter(); single(); t_single = time.perf_counter() - t0
        t0 = time.perf_counter(); single_reduce()
        t_sred = time.perf_counter() - t0
        t0 = time.perf_counter(); mesh1(); t_mesh = time.perf_counter() - t0
        row = {
            "P": P,
            "batch_size": BS,
            "single_chip_s": round(t_single, 4),
            "single_reduce_s": round(t_sred, 4),
            "mesh1_s": round(t_mesh, 4),
            "single_folds_per_sec": round(P / t_single, 1),
            "single_reduce_folds_per_sec": round(P / t_sred, 1),
            "mesh1_folds_per_sec": round(P / t_mesh, 1),
            "mesh1_over_single": round(t_mesh / t_single, 3),
            "mesh1_over_single_reduce": round(t_mesh / t_sred, 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mesh_one_chip.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
