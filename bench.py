"""Headline benchmark: weighted all-on LOOCV on the reference grid.

Reproduces the reference's flagship configuration
(``benchmarks/benchmark.py:222-252``): N=100,000 samples, K=500 features,
M=10 targets, float64, random nonuniform weights, all four center/scale
flags on, P=100,000-fold (leave-one-out) cross-validation. The measured
quantity is the reference's: total cross-validation time = one fit + the
training matrices of ALL folds (warm-JIT, matching the reference's
``warmjit`` mode, ``benchmarks/benchmark.py:207-213``).

Baseline: the fastest published reference number for this configuration is
1.299 s total on an RTX 3090 Ti (JAX backend, warm JIT —
``benchmarks/benchmark_results_jax.csv:106``; see BASELINE.md), i.e. ~76,982
folds/s. ``vs_baseline`` is our folds/s over that.

Prints ONE JSON line to stdout. Environment knobs (reference-compatible):
BENCH_N, BENCH_K, BENCH_M, BENCH_P, BENCH_BATCH (0 = auto), BENCH_DTYPE, plus
BENCH_IMPL=auto|pallas|xla (auto = fused double-float Pallas kernel on
TPU f64, raw hi/lo pair materialisation — see chunk_mats below).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _backend_watchdog(seconds: float):
    """Fail fast (one JSON line, exit 3) if the device backend never
    initialises — a dead remote-TPU tunnel otherwise hangs jax.devices()
    forever and takes the whole benchmark run with it."""
    import os as _os
    import threading

    ready = threading.Event()

    def bail():
        if not ready.wait(seconds):
            print(json.dumps({
                "metric": "benchmark_backend_unavailable",
                "value": 0.0,
                "unit": "folds/s",
                "vs_baseline": 0.0,
            }), flush=True)
            log(f"backend did not initialise within {seconds:.0f}s "
                "(remote tunnel down?) — aborting")
            _os._exit(3)

    threading.Thread(target=bail, daemon=True).start()
    return ready


def main():
    import jax
    import jax.numpy as jnp

    # BENCH_PLATFORM=cpu pins the backend (smoke tests / host comparisons);
    # the JAX_PLATFORMS env var is overridden by PJRT plugin site hooks.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    ready = _backend_watchdog(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", 900))
    )

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    P = int(os.environ.get("BENCH_P", N))  # LOOCV by default
    dtype = np.dtype(os.environ.get("BENCH_DTYPE", "float64")).type
    batch = int(os.environ.get("BENCH_BATCH", 0)) or None  # None: HBM-budget auto

    if np.dtype(dtype).itemsize >= 8:
        jax.config.update("jax_enable_x64", True)

    from cvmatrix_tpu import CVConfig, Partitioner, fit
    from cvmatrix_tpu.models.sweep import materialize_sweep
    from cvmatrix_tpu.utils import enable_persistent_cache

    if os.environ.get("BENCH_PERSISTENT_CACHE", "1") != "0":
        log(f"persistent compile cache: {enable_persistent_cache()}")

    impl = os.environ.get("BENCH_IMPL", "auto")
    # Phase diagnostics (separate fit / folds timings) compile two extra
    # programs; BENCH_PHASES=0 skips them so an AOT cold run pays only the
    # artifact's own first-call compile.
    phases = os.environ.get("BENCH_PHASES", "1") != "0"

    log(f"bench: N={N} K={K} M={M} P={P} dtype={np.dtype(dtype).name} "
        f"batch={batch} impl={impl} device={jax.devices()[0]}")
    ready.set()  # backend is up; disarm the watchdog

    rng = np.random.default_rng(42)
    X = rng.random((N, K), dtype=np.float64).astype(dtype)
    Y = rng.random((N, M), dtype=np.float64).astype(dtype)
    weights = rng.random(N).astype(dtype)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=dtype)

    # Fold index batches, bucketed by size so every bucket vmaps with one
    # fixed shape (the reference driver's strategy, benchmark.py:144-152).
    p = Partitioner(np.arange(N) % P)
    buckets = {}
    for k, v in p.folds_dict.items():
        buckets.setdefault(v.size, []).append(v)
    stacks = [np.stack(vs) for vs in buckets.values()]

    jfit = jax.jit(
        lambda c, x, y, w: fit(c, x, y, w, validate=False), static_argnums=(0,)
    )
    Xd, Yd, wd = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(weights)

    # NOTE on timing honesty: on remote-tunneled TPU runtimes (axon),
    # block_until_ready can return at enqueue. Every measurement therefore
    # fetches a scalar that DEPENDS on the produced buffers at the end — the
    # fetch cannot complete before the device work has.

    def fit_once():
        st = jfit(cfg, Xd, Yd, wd)
        float(st.XTX[0, 0])  # host fetch = completion barrier
        return st

    # Fold sweep: one compiled fori_loop per size bucket materialises every
    # fold's training matrices in HBM (see materialize_sweep — on TPU+f64
    # they land as double-float hi/lo pairs, hi + lo == the f64 value, via
    # the fused Pallas kernel; BENCH_IMPL=xla forces the vmapped engine).
    # Bucket probes accumulate ON DEVICE; the single host fetch at the end
    # is the one completion barrier for the whole sweep.
    def run_folds(st):
        s = None
        for stack in stacks:
            p = materialize_sweep(
                cfg, st, jnp.asarray(stack), batch_size=batch, impl=impl,
            )
            s = p if s is None else s + p
        return float(s)

    # Measured: total CV = fit + all folds in ONE device-chained run with a
    # single completion barrier at the end — the reference's methodology
    # (fit + every fold, then one block_until_ready:
    # ``benchmarks/benchmark.py:148-152``). With a single fold-size bucket
    # (the common case) the FUSED driver runs fit + sweep as one compiled
    # program and shares the dataset slice planes between the fit
    # contraction and the fold kernel (materialize_cv); otherwise the fold
    # sweep consumes the fitted state on-device, no intermediate fetch.
    from cvmatrix_tpu.models.sweep import materialize_cv

    # AOT cold path: when a pre-exported artifact for this exact shape
    # exists (benchmarks/aot/), load it — the multi-minute trace+lower never
    # runs; the first call's device compile is served by the persistent
    # cache on a warm machine. BENCH_AOT=0 disables; a missing artifact is
    # exported after the measurements (on TPU) so the NEXT cold run has it.
    aot_fn = None
    aot_path = None
    use_aot = (
        os.environ.get("BENCH_AOT", "1") != "0" and len(stacks) == 1
    )
    if use_aot:
        from cvmatrix_tpu import __version__
        from cvmatrix_tpu.utils import load_program

        aot_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks", "aot",
            f"totalcv_n{N}_k{K}_m{M}_p{P}_{np.dtype(dtype).name}_"
            f"{impl}_b{batch or 0}_v{__version__}_"
            f"{jax.devices()[0].platform}.aot",
        )
        if os.path.exists(aot_path):
            t0 = time.perf_counter()
            aot_fn = load_program(aot_path)
            log(f"AOT artifact loaded in {time.perf_counter() - t0:.2f}s: "
                f"{aot_path}")

    def total_fn(x, y, w, ib):
        return materialize_cv(
            cfg, x, y, w, ib, batch_size=batch, impl=impl, validate=False,
        )

    if len(stacks) == 1:
        stack0 = jnp.asarray(stacks[0])
        if aot_fn is not None:
            def total_cv():
                return float(aot_fn(Xd, Yd, wd, stack0))
        else:
            def total_cv():
                return float(total_fn(Xd, Yd, wd, stack0))
    else:
        def total_cv():
            st = jfit(cfg, Xd, Yd, wd)
            return run_folds(st)  # probe fetch = the single barrier

    state = None
    if phases:
        # Warm-up: compile fit + fold programs (cold-JIT excluded, like the
        # reference's warmjit mode).
        t0 = time.perf_counter()
        state = fit_once()
        log(f"fit compile+run: {time.perf_counter() - t0:.3f}s")
        t0 = time.perf_counter()
        run_folds(state)
        log(f"folds compile+first run: {time.perf_counter() - t0:.3f}s")

        # Per-phase breakdown (each phase pays one ~30 ms tunnel round trip
        # for its completion fetch — informational only).
        state = None  # release before refit (two states at K=20k exceed HBM)
        t0 = time.perf_counter()
        state = fit_once()
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_folds(state)
        t_folds = time.perf_counter() - t0
        log(f"warm phases: fit={t_fit:.3f}s folds={t_folds:.3f}s "
            "(each incl. one completion round trip)")

    state = None
    t0 = time.perf_counter()
    total_cv()  # AOT: first call = device compile; else compile+warm
    log(f"total-CV first call: {time.perf_counter() - t0:.3f}s "
        f"({'aot' if aot_fn is not None else 'jit'})")
    t0 = time.perf_counter()
    total_cv()
    total = time.perf_counter() - t0
    folds_per_sec = P / total
    log(f"warm total CV (single barrier): {total:.3f}s "
        f"-> {folds_per_sec:,.0f} folds/s")

    baseline_folds_per_sec = 100_000 / 1.299  # ref RTX 3090 Ti warm JIT
    name = (
        f"weighted_TTTT_P{P}_total_cv_folds_per_sec_"
        f"n{N}_k{K}_{np.dtype(dtype).name}"
    )
    print(json.dumps({
        "metric": name,
        "value": round(folds_per_sec, 1),
        "unit": "folds/s",
        "vs_baseline": round(folds_per_sec / baseline_folds_per_sec, 3),
    }))

    if (use_aot and aot_fn is None
            and jax.devices()[0].platform != "cpu"):
        # Ship the artifact for the next cold run (outside the timings).
        from cvmatrix_tpu.utils import export_program

        t0 = time.perf_counter()
        size = export_program(total_fn, (Xd, Yd, wd, stack0), aot_path)
        log(f"AOT artifact exported ({size} B, "
            f"{time.perf_counter() - t0:.1f}s): {aot_path}")


if __name__ == "__main__":
    main()
