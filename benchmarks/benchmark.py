"""Full-grid cross-validation benchmark harness.

Mirrors the reference harness's shape (``/root/reference/benchmarks/
benchmark.py:222-332``): total cross-validation time (one fit + training
matrices for ALL folds) over P-fold splits of an (N, K) random dataset,
swept over preprocessing combinations and weighted/unweighted, appended to a
CSV. Environment knobs are reference-compatible:

  BENCH_N (100000)   BENCH_K (500)      BENCH_M (10)
  BENCH_PS ("3,5,10,100,1000,10000,100000")
  BENCH_CONFIGS ("plot" = the 3 reference-figure combos | "all" = 16)
  BENCH_BATCH (0 = HBM-budget auto) fold-batch chunk size
  BENCH_NAIVE ("0")  also time the naive NumPy oracle (very slow)
  BENCH_NAIVE_ONLY ("0")  skip the fast engine (naive rows only)
  BENCH_NAIVE_SUBSET ("0")  time S folds, extrapolate to P (labeled)
  BENCH_DTYPE ("float64")
  BENCH_CSV ("benchmark_results.csv")
  BENCH_MODES ("warmjit" | "nojit,coldjit,warmjit")
  BENCH_PLATFORM (unset = default device; "cpu" pins the host backend)

Additional TPU-native measurements (no reference equivalent):
  - per-phase timing (fit vs folds) and folds/s
  - achieved HBM GB/s of the fold phase vs the chip's roofline
    (the BASELINE.json north-star metric).
"""

import os
import sys
import time
from itertools import product

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# `barrier` labels how the `time` column was measured — totals and
# per-phase numbers come from DIFFERENT runs, so without the label a
# single-barrier total can read as disagreeing with fit_time+folds_time:
#   fused-single   one materialize_cv program, one completion fetch
#   single-chain   fit -> fold sweep chained on device, one fetch
#   sum-of-phases  time = fit_time + folds_time (nojit/coldjit)
#   host           host wall time (naive oracle rows)
# fit_time/folds_time are ALWAYS from separate phased runs, each paying
# its own ~30 ms completion fetch over a remote tunnel.
CSV_HEADER = (
    "model,weights,P,N,K,M,center_X,center_Y,scale_X,scale_Y,"
    "time,fit_time,folds_time,folds_per_sec,gbps,barrier,version,date\n"
)


def save_row(csv_path, **kw):
    # Every row carries its measurement date (UTC). The grid CSV is
    # append-only across rounds; the plotting side selects the latest row
    # per configuration EXPLICITLY (``plot_benchmark.latest_per_config``)
    # instead of relying on implicit row order.
    kw.setdefault("date", time.strftime("%Y-%m-%d", time.gmtime()))
    try:
        with open(csv_path, "x") as f:
            f.write(CSV_HEADER)
        cols = CSV_HEADER.strip().split(",")
    except FileExistsError:
        # Append in the FILE's own column order (a pre-`barrier` file keeps
        # its schema consistent rather than silently shifting columns).
        with open(csv_path) as f:
            cols = f.readline().strip().split(",")
    with open(csv_path, "a") as f:
        f.write(",".join(str(kw.get(c, "")) for c in cols) + "\n")


def fold_phase_bytes(P, n_val, K, M, itemsize, weighted):
    """Minimum HBM traffic of the fold phase (the roofline denominator).

    Per fold: write XTX (K*K) + XTY (K*M) + stats; read the gathered
    validation rows (WX, X if weighted, Y, WY if weighted, w) and the
    replicated globals once per fold batch (amortised -> ignored).
    """
    out = K * K + K * M + 2 * K + 2 * M
    rows = n_val * (K * (2 if weighted else 1) + 2 * M + (1 if weighted else 0))
    return P * (out + rows) * itemsize


def run_cvmatrix(cfg_flags, P, X, Y, weights, batch, mode="warmjit"):
    import jax
    import jax.numpy as jnp

    from cvmatrix_tpu import CVConfig, Partitioner, fit, training_XTX_XTY
    from cvmatrix_tpu.models.sweep import materialize_sweep

    cx, cy, sx, sy = cfg_flags
    dtype = X.dtype.type
    cfg = CVConfig(cx, cy, sx, sy, ddof=1, dtype=dtype)
    n = X.shape[0]
    p = Partitioner(np.arange(n) % P)
    buckets = {}
    for k, v in p.folds_dict.items():
        buckets.setdefault(v.size, []).append(v)
    stacks = [np.stack(vs) for vs in buckets.values()]

    Xd = jnp.asarray(X)
    Yd = jnp.asarray(Y)
    wd = None if weights is None else jnp.asarray(weights)
    jfit = jax.jit(
        lambda c, x, y, w: fit(c, x, y, w, validate=False), static_argnums=(0,)
    )

    def fit_once():
        st = jfit(cfg, Xd, Yd, wd)
        float(st.XTX[0, 0])  # host scalar fetch = completion barrier
        return st

    def run_all_folds(st):
        # Single-dispatch sweep per size bucket; bucket probes accumulate
        # ON DEVICE and the one host fetch at the end is the completion
        # barrier for everything (block_until_ready can return at enqueue
        # on remote-tunneled runtimes).
        s = None
        for stack in stacks:
            p = materialize_sweep(cfg, st, jnp.asarray(stack),
                                  batch_size=batch)
            s = p if s is None else s + p
        return float(s)

    if mode == "nojit":
        # Eager per-chunk dispatch (the reference's nojit vmap mode).
        vfold = jax.vmap(training_XTX_XTY, in_axes=(None, None, 0))
        probe = jax.jit(
            lambda o, s:
            (o[0][0][0, 0, 0] + o[0][1][0, 0, 0]).astype(jnp.float64) + s
        )
        t0 = time.perf_counter()
        st = fit_once()
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = jnp.zeros((), jnp.float64)
        b = batch or 500
        for stack in stacks:
            d = jnp.asarray(stack)
            for off in range(0, d.shape[0], b):
                s = probe(vfold(cfg, st, d[off : off + b]), s)
        float(s)
        t_folds = time.perf_counter() - t0
        return t_fit, t_folds, t_fit + t_folds, "sum-of-phases"

    if mode == "aotcold":
        # Cold start through a pre-exported AOT artifact: load + ONE call
        # (device compile + fit + all folds). The artifact build (trace +
        # lower on a builder host) happens once per config and is excluded
        # — it ships with the fleet, like a wheel. Single-size-bucket
        # configs only (the fused single-program total).
        if len(stacks) != 1:
            print(f"aotcold: skipped (P={P} has {len(stacks)} fold-size "
                  "buckets; the fused single-program path needs 1)",
                  flush=True)
            return None
        from cvmatrix_tpu import __version__ as _v
        from cvmatrix_tpu.models.sweep import materialize_cv
        from cvmatrix_tpu.utils import export_program, load_program

        platform = jax.devices()[0].platform
        flags_s = "".join("T" if f else "F" for f in cfg_flags)
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "aot",
            f"grid_{flags_s}_w{int(weights is not None)}_p{P}_"
            f"n{n}_k{X.shape[1]}_m{Y.shape[1]}_{X.dtype.name}_v{_v}_"
            f"{platform}.aot",
        )

        def total_fn(x, y, w_, ib):
            return materialize_cv(cfg, x, y, w_, ib, batch_size=batch,
                                  validate=False)

        stack0 = jnp.asarray(stacks[0])
        if not os.path.exists(path):
            t0 = time.perf_counter()
            size = export_program(
                total_fn, (Xd, Yd, wd, stack0), path,
                platforms=[platform],
                allow_backend_mismatch=platform == "cpu",
            )
            print(f"aotcold: exported {size} B in "
                  f"{time.perf_counter() - t0:.1f}s (builder step, not "
                  f"timed): {path}", flush=True)
        t0 = time.perf_counter()
        fn = load_program(path)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(fn(Xd, Yd, wd, stack0))
        t_first = time.perf_counter() - t0
        return t_load, t_first, t_load + t_first, "aot-first-call"

    if mode == "coldjit":
        t0 = time.perf_counter()
        st = fit_once()
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_all_folds(st)
        t_folds = time.perf_counter() - t0
        return t_fit, t_folds, t_fit + t_folds, "sum-of-phases"

    # warmjit: compile first, measure second.
    st = fit_once()
    run_all_folds(st)
    # Phase diagnostics (each fetch pays one ~30 ms tunnel round trip).
    t0 = time.perf_counter()
    st = fit_once()
    t_fit = time.perf_counter() - t0
    t0 = time.perf_counter()
    run_all_folds(st)
    t_folds = time.perf_counter() - t0
    # Headline: fit + all folds in ONE device-chained run with a single
    # completion barrier — the reference's methodology (one
    # block_until_ready after the last fold batch). With a single fold-size
    # bucket the fused driver additionally shares the dataset slice planes
    # between the fit contraction and the fold kernel (materialize_cv).
    st = None
    if len(stacks) == 1:
        from cvmatrix_tpu.models.sweep import materialize_cv

        def total_once():
            return float(materialize_cv(
                cfg, Xd, Yd, wd, jnp.asarray(stacks[0]), batch_size=batch,
            ))

        total_once()  # compile the fused program outside the timing
        t0 = time.perf_counter()
        total_once()
        t_total = time.perf_counter() - t0
        barrier = "fused-single"
    else:
        t0 = time.perf_counter()
        run_all_folds(jfit(cfg, Xd, Yd, wd))
        t_total = time.perf_counter() - t0
        barrier = "single-chain"
    return t_fit, t_folds, t_total, barrier


def measure_write_bw(n_mb: int = 1000, reps: int = 50) -> float:
    """Achievable HBM store bandwidth (GB/s), measured on this chip.

    The datasheet roofline (~819 GB/s on v5e) is a read+write aggregate;
    a pure store stream caps substantially lower (~470-540 GB/s measured,
    depending on access pattern). The fold phase is store-dominated, so
    achieved GB/s should be read against BOTH numbers: the no-preprocessing
    LOOCV fold phase lands between the pure-store ceiling and the aggregate
    (it interleaves reads of the resident total with the output stream).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = n_mb * (1 << 20) // 4
    rows = n // 512
    x = jnp.ones((rows, 1), jnp.float32)

    @jax.jit
    def sweep(x):
        def body(c, carry):
            return jnp.broadcast_to(x, (rows, 512)) * (1.0 + c * 0.0)
        out = lax.fori_loop(0, reps, body, jnp.zeros((rows, 512), jnp.float32))
        return out[0, 0]

    float(sweep(x))
    t0 = time.perf_counter()
    float(sweep(x))
    dt = time.perf_counter() - t0
    return reps * rows * 512 * 4 / dt / 1e9


def run_naive(cfg_flags, P, X, Y, weights):
    """Naive-oracle total CV time; returns (seconds, extrapolated_flag).

    BENCH_NAIVE_SUBSET=S (0 = off) times S folds and extrapolates linearly
    to P — each fold recomputes the same-size training block, so per-fold
    cost is constant in P and the scaling is exact up to host noise. Rows
    produced this way are labeled (model suffix + barrier) so the figure
    can distinguish measured from extrapolated points (the reference
    publishes fully-measured naive rows; this environment has one shared
    CPU core, where P=1000 x ~40 s/fold would be ~11 h of wall clock).
    """
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from oracle import NaiveOracle

    cx, cy, sx, sy = cfg_flags
    n = X.shape[0]
    folds = np.arange(n) % P
    subset = int(os.environ.get("BENCH_NAIVE_SUBSET", 0))
    n_folds = P if not subset else min(subset, P)
    t0 = time.perf_counter()
    o = NaiveOracle(cx, cy, sx, sy, ddof=1, dtype=X.dtype).fit(X, Y, weights)
    all_idx = np.arange(n)
    for f in range(n_folds):
        o.training_XTX_XTY(all_idx[folds != f])
    t = time.perf_counter() - t0
    if n_folds == P:
        return t, False
    t_fit = time.perf_counter()  # re-measure fit to subtract before scaling
    NaiveOracle(cx, cy, sx, sy, ddof=1, dtype=X.dtype).fit(X, Y, weights)
    t_fit = time.perf_counter() - t_fit
    return t_fit + (t - t_fit) * (P / n_folds), True


def main():
    import jax

    # BENCH_PLATFORM=cpu pins the backend for host-only comparison rows
    # (the JAX_PLATFORMS env var is unreliable when a PJRT plugin site
    # hook preregisters a device platform; the config call is not).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    from cvmatrix_tpu import __version__
    from cvmatrix_tpu.utils import enable_persistent_cache

    if os.environ.get("BENCH_PERSISTENT_CACHE", "1") != "0":
        print("persistent compile cache:", enable_persistent_cache(),
              file=sys.stderr, flush=True)

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    Ps = [int(x) for x in os.environ.get(
        "BENCH_PS", "3,5,10,100,1000,10000,100000").split(",")]
    dtype = np.dtype(os.environ.get("BENCH_DTYPE", "float64"))
    batch = int(os.environ.get("BENCH_BATCH", 0)) or None  # None: HBM-budget auto
    csv_path = os.environ.get("BENCH_CSV", "benchmark_results.csv")
    modes = os.environ.get("BENCH_MODES", "warmjit").split(",")
    if dtype.itemsize >= 8:
        jax.config.update("jax_enable_x64", True)

    cfg_env = os.environ.get("BENCH_CONFIGS", "plot")
    if cfg_env == "plot":
        configs = [
            (False, False, False, False),
            (True, True, False, False),
            (True, True, True, True),
        ]
    elif cfg_env == "all":
        configs = list(product([True, False], repeat=4))
    else:
        # Explicit flag strings, e.g. "TTTT,FFTF" (center_X center_Y
        # scale_X scale_Y).
        configs = [tuple(ch == "T" for ch in s) for s in cfg_env.split(",")]

    # v5e HBM datasheet roofline ~819 GB/s; override via BENCH_HBM_GBPS.
    hbm_roof = float(os.environ.get("BENCH_HBM_GBPS", 819.0))
    # Measured achievable STORE bandwidth — the honest roofline for the
    # store-dominated fold phase (BENCH_PROBE_BW=0 to skip).
    store_roof = None
    if os.environ.get("BENCH_PROBE_BW", "1") == "1":
        try:
            store_roof = measure_write_bw()
            print(f"measured store bandwidth: {store_roof:.0f} GB/s "
                  f"(datasheet aggregate {hbm_roof:.0f})", flush=True)
        except Exception as e:  # CPU or probe failure: fall back
            print(f"store-bw probe skipped: {e}", flush=True)

    if os.environ.get("BENCH_DATA", "random") == "nir":
        # The NIR grain dataset: real when CVMATRIX_TPU_NIR_CSV points at a
        # local copy, the synthetic analogue otherwise (tests/data.py).
        # Shapes come from the data (26617 x 102); BENCH_N/K are ignored.
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tests"))
        from data import nir_dataset

        Xn, Yn, _, wn = nir_dataset(m=min(M, 10))
        X = Xn.astype(dtype)
        Y = Yn.astype(dtype)
        weights = wn.astype(dtype)
        N, K = X.shape
        M = Y.shape[1]
        print(f"BENCH_DATA=nir: N={N} K={K} M={M}", flush=True)
    else:
        rng = np.random.default_rng(42)
        X = rng.random((N, K)).astype(dtype)
        Y = rng.random((N, M)).astype(dtype)
        weights = rng.random(N).astype(dtype)
    platform = jax.devices()[0].platform

    naive_only = os.environ.get("BENCH_NAIVE_ONLY", "0") == "1"
    for use_w, flags, P in product([True, False], configs, Ps):
        w = weights if use_w else None
        for mode in modes:
            if naive_only:
                break
            res = run_cvmatrix(flags, P, X, Y, w, batch, mode)
            if res is None:
                continue
            t_fit, t_folds, total, barrier = res
            if barrier == "aot-first-call":
                # t_fit/t_folds are artifact-load / first-call here; the
                # fold-phase GB/s denominator does not apply.
                gbps = None
                detail = (f"(load {t_fit:.3f} + first-call {t_folds:.3f}) "
                          "cold via AOT artifact")
            else:
                gbps = fold_phase_bytes(
                    P, N // P, K, M, dtype.itemsize, use_w
                ) / t_folds / 1e9
                ref_s = f"{gbps/hbm_roof:.0%} of {hbm_roof:.0f} GB/s aggregate"
                if store_roof:
                    ref_s += (
                        f"; measured pure-store ceiling {store_roof:.0f} GB/s"
                    )
                detail = (f"(fit {t_fit:.3f} + folds {t_folds:.3f}) "
                          f"{P/total:,.0f} folds/s, {gbps:.0f} GB/s ({ref_s})")
            print(
                f"CVMatrix-tpu-{platform}-{mode} w={use_w} P={P} "
                f"flags={flags}: total={total:.3f}s {detail}",
                flush=True,
            )
            save_row(
                csv_path,
                model=f"CVMatrix-tpu-{platform}-{mode}",
                weights=use_w, P=P, N=N, K=K, M=M,
                center_X=flags[0], center_Y=flags[1],
                scale_X=flags[2], scale_Y=flags[3],
                time=round(total, 4), fit_time=round(t_fit, 4),
                folds_time=round(t_folds, 4),
                folds_per_sec=round(P / total, 1),
                gbps="" if gbps is None else round(gbps, 1),
                barrier=barrier, version=__version__,
            )
        if os.environ.get("BENCH_NAIVE", "0") == "1":
            t, extrap = run_naive(flags, P, X, Y, w)
            tag = "-extrapolated" if extrap else ""
            print(f"NaiveOracle{tag} w={use_w} P={P} flags={flags}: "
                  f"{t:.2f}s", flush=True)
            save_row(
                csv_path, model=f"NaiveOracle{tag}", weights=use_w, P=P,
                N=N, K=K, M=M, center_X=flags[0], center_Y=flags[1],
                scale_X=flags[2], scale_Y=flags[3], time=round(t, 4),
                barrier="host-extrapolated" if extrap else "host",
                version=__version__,
            )


if __name__ == "__main__":
    main()
