"""Cold-start decomposition: where does a fresh-process total-CV go?

VERDICT round-4 weak #5: BENCH_r04 recorded "fit compile+run: 182.1 s"
on a fresh box (persistent cache enabled but COLD), while ROADMAP's
round-3 fresh-process measurement claimed 28 s fit compile — a 6.5x
discrepancy with no decomposition on record. This script settles it by
timing every phase of a cold start separately, against an EMPTY scratch
compilation cache (the real package cache is not touched):

  import_jax      — process import cost
  backend_init    — first jax.devices() (tunnel/PJRT handshake on axon)
  trivial_op      — first tiny compile+run (runtime warmup)
  h2d             — shipping X/Y/w to the device
  fit_lower       — jit(fit).lower(): Python trace + StableHLO lowering
  fit_compile     — lowered.compile(): XLA/Mosaic compile (remote helper)
  fit_run         — first execution + scalar completion fetch
  totalcv_lower / totalcv_compile / totalcv_run
                  — same three for the fused materialize_cv program
                    (fit + full LOOCV sweep, the bench.py fast path)
  totalcv_warm    — second execution (the steady-state headline number)

The split matters because "compile time" on this runtime is three very
different costs: host-side tracing (pure Python, scales with unrolled
ops in the trace), XLA compile (remote helper, scales with HLO size),
and first-run device/runtime warmup. Reference comparison point: the
reference's worst published cold-JIT total is 23.3 s on an RTX 3090 Ti
(ref ``benchmarks/benchmark_results_jax.csv:45``).

Writes benchmarks/coldstart_phases.json. Env: BENCH_N/K/M/P (defaults =
the headline 100k/500/10/100k), COLD_KEEP_CACHE=1 reuses the scratch dir.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    phases = {}
    t0 = time.perf_counter()
    import numpy as np
    import jax
    import jax.numpy as jnp
    phases["import_jax_s"] = round(time.perf_counter() - t0, 3)

    jax.config.update("jax_enable_x64", True)
    # Empty scratch cache: measures true cold compiles without poisoning
    # (or benefiting from) the package's persistent cache.
    scratch = os.environ.get("COLD_CACHE_DIR") or tempfile.mkdtemp(
        prefix="cvmatrix_coldxla_")
    os.environ["CVMATRIX_TPU_CACHE"] = scratch
    from cvmatrix_tpu.utils import enable_persistent_cache
    enable_persistent_cache()

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    phases["backend_init_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    float(jnp.arange(8.0).sum())
    phases["trivial_op_s"] = round(time.perf_counter() - t0, 3)

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    P = int(os.environ.get("BENCH_P", N))

    from cvmatrix_tpu import CVConfig, Partitioner, fit
    from cvmatrix_tpu.models.sweep import materialize_cv

    rng = np.random.default_rng(42)
    X = rng.random((N, K))
    Y = rng.random((N, M))
    w = rng.random(N)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)

    t0 = time.perf_counter()
    Xd, Yd, wd = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w)
    float(wd[0])
    phases["h2d_s"] = round(time.perf_counter() - t0, 3)

    part = Partitioner(np.arange(N) % P)
    sizes = {v.size for v in part.folds_dict.values()}
    assert len(sizes) == 1, "decomposition assumes one fold-size bucket"
    stack = jnp.asarray(np.stack(list(part.folds_dict.values())))

    jfit = jax.jit(lambda x, y, ww: fit(cfg, x, y, ww, validate=False))
    t0 = time.perf_counter()
    fit_lowered = jfit.lower(Xd, Yd, wd)
    phases["fit_lower_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    fit_compiled = fit_lowered.compile()
    phases["fit_compile_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    st = fit_compiled(Xd, Yd, wd)
    float(st.XTX[0, 0])
    phases["fit_run_s"] = round(time.perf_counter() - t0, 3)
    st = None

    jtot = jax.jit(lambda x, y, ww, ib: materialize_cv(
        cfg, x, y, ww, ib, batch_size=None, impl="auto", validate=False))
    t0 = time.perf_counter()
    tot_lowered = jtot.lower(Xd, Yd, wd, stack)
    phases["totalcv_lower_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    tot_compiled = tot_lowered.compile()
    phases["totalcv_compile_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    float(tot_compiled(Xd, Yd, wd, stack))
    phases["totalcv_run_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    float(tot_compiled(Xd, Yd, wd, stack))
    phases["totalcv_warm_s"] = round(time.perf_counter() - t0, 3)

    cold_total = (phases["fit_lower_s"] + phases["fit_compile_s"]
                  + phases["fit_run_s"])
    out = {
        "N": N, "K": K, "M": M, "P": P, "dtype": "float64",
        "config": "TTTT", "platform": dev.platform, "device": str(dev),
        "jax": jax.__version__,
        "scratch_cache": scratch,
        "phases": phases,
        "fit_cold_total_s": round(cold_total, 3),
        "totalcv_cold_total_s": round(
            phases["totalcv_lower_s"] + phases["totalcv_compile_s"]
            + phases["totalcv_run_s"], 3),
        "ref_worst_cold_jit_s": 23.346,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "coldstart_phases.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("COLDSTART OK", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
