"""Phase-split of the mesh(1) mid-band overhead (VERDICT r3 weak #2).

mesh_one_chip.json recorded mesh(1) at 3.86x the single-chip sweep at
P=10,000 (N=100k K=500 TTTT). This script splits the mesh reduce
program's warm step into its phases on ONE real chip:

  full          sharded_cross_validate_reduce (the measured 3.86x path)
  gather        scan of the mask-and-reduce-scatter row gather alone
  gather+stats  + block assembly + vmapped training stats
  foldmath      scan of batched_matrices_from_blocks on ONE pre-built
                chunk x n_chunks (fold math incl. per-chunk Ozaki row
                slicing; no gather)
  stats-only    scan of stats_from_blocks on the same pre-built chunk
  single        materialize_sweep (the single-chip reference point)

Writes benchmarks/tpu_batch/diag_mesh1.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from jax.sharding import PartitionSpec as P

    from cvmatrix_tpu import CVConfig, Partitioner, fit
    from cvmatrix_tpu.core.batch import (
        batched_matrices_from_blocks,
        stats_from_blocks,
    )
    from cvmatrix_tpu.models.sweep import materialize_sweep
    from cvmatrix_tpu.parallel.distributed import (
        ROWS,
        _blocks_from_gathered,
        _gather_sources,
        _globals_only,
        _local_gather_scatter,
        make_mesh,
        sharded_cross_validate_reduce,
    )
    from cvmatrix_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    P_folds = int(os.environ.get("BENCH_P", 10_000))
    batch_size = int(os.environ.get("BENCH_BATCH", 256))
    interpret = os.environ.get("BENCH_INTERPRET", "0") == "1"  # CPU smoke

    rng = np.random.default_rng(42)
    X = rng.random((N, K))
    Y = rng.random((N, M))
    w = rng.random(N)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    state = fit(cfg, X, Y, w, validate=False)
    mesh = make_mesh(jax.devices()[:1])
    n_dev = 1

    part = Partitioner(np.arange(N) % P_folds)
    idx = np.stack(list(part.folds_dict.values()))
    n_folds, n_l = idx.shape

    # Mirror sharded_cross_validate_reduce's chunking exactly.
    bs = max(n_dev, min(batch_size, n_folds) // n_dev * n_dev)
    n_chunks = -(-n_folds // bs)
    bs = -(-(-(-n_folds // n_chunks)) // n_dev) * n_dev
    n_chunks = -(-n_folds // bs)
    idx_c = jnp.asarray(idx[: n_chunks * bs].reshape(n_chunks, bs, n_l))
    shard_rows = state.X.shape[0] // n_dev
    sources = _gather_sources(cfg, state, True)
    names = tuple(sources.keys())
    globals_only = _globals_only(cfg, state)

    def probe_reduce(mats, stats):
        xtx, xty = mats
        return xtx.reshape(-1)[0] + xty.reshape(-1)[0]

    timings = {}

    def timed(name, fn):
        fn()  # compile + warm
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 4)
        print(f"{name}: {dt:.4f}s ({P_folds/dt:,.0f} folds/s)", flush=True)

    # --- full mesh(1) path -------------------------------------------------
    def full():
        out = sharded_cross_validate_reduce(
            cfg, state, idx, mesh=mesh, reduce_fn=probe_reduce,
            batch_size=batch_size,
        )
        return float(out[0])

    timed("full_mesh1", full)

    # --- gather-only scan --------------------------------------------------
    def make_scan(stage):
        def body(srcs, st, ic):
            def step(carry, ci):
                gathered = _local_gather_scatter(
                    srcs, ci, shard_rows, split64=True)
                if stage == "gather":
                    p = sum(jnp.sum(g[0, 0]) for g in gathered.values())
                    return carry + p, None
                blocks = _blocks_from_gathered(cfg, True, gathered, None,
                                               True)
                st5 = stats_from_blocks(cfg, st, blocks, True, True)
                p = sum(jnp.sum(s[0]) for s in st5 if s is not None)
                return carry + p, None

            carry, _ = jax.lax.scan(step, jnp.zeros((), jnp.float64), ic)
            return carry

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=({k: P(ROWS, None) for k in names}, P(), P()),
            out_specs=P(),
            check_vma=False,
        ))

    for stage in ("gather", "gather_stats"):
        prog = make_scan(stage)

        def run(prog=prog):
            return float(prog(sources, globals_only, idx_c))

        timed(stage, run)

    # --- fold math on a fixed pre-built chunk (no gather) -------------------
    gather_one = jax.jit(jax.shard_map(
        lambda srcs, ci: _local_gather_scatter(srcs, ci, shard_rows,
                                               split64=True),
        mesh=mesh,
        in_specs=({k: P(ROWS, None) for k in names}, P()),
        out_specs={k: P(ROWS) for k in names},
        check_vma=False,
    ))
    gathered0 = gather_one(sources, idx_c[0])
    blocks0 = _blocks_from_gathered(cfg, True, gathered0, None, True)
    blocks0 = jax.tree.map(lambda a: jnp.asarray(a), blocks0)

    def make_fixed(kind):
        @jax.jit
        def run(blks, st):
            def step(c, _):
                if kind == "stats":
                    st5 = stats_from_blocks(cfg, st, blks, True, True)
                    p = sum(jnp.sum(s[0]) for s in st5 if s is not None)
                else:
                    (mx, my), _ = batched_matrices_from_blocks(
                        cfg, st, blks, impl="pallas", interpret=interpret)
                    p = mx.reshape(-1)[0] + my.reshape(-1)[0]
                return c + p, None

            c, _ = jax.lax.scan(
                step, jnp.zeros((), jnp.float64), None, length=n_chunks)
            return c

        return run

    for kind in ("stats", "foldmath"):
        prog = make_fixed(kind)

        def run(prog=prog):
            return float(prog(blocks0, globals_only))

        timed(f"fixed_{kind}", run)

    # --- single-chip reference ----------------------------------------------
    def single():
        return float(materialize_sweep(cfg, state, idx))

    timed("single_chip_sweep", single)

    out = {
        "N": N, "K": K, "M": M, "P": P_folds, "bs": bs,
        "n_chunks": n_chunks, **timings,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "diag_mesh1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, file=sys.stderr)


if __name__ == "__main__":
    main()
