"""AOT artifact exercised on the real chip (VERDICT round-2 task 9).

``tests/test_aot.py`` proves the CPU round-trip and that a tpu-platform
artifact lowers on a CPU-only host; this script closes the loop on
hardware: export a kernel-routed fold-sweep program for platform "tpu",
load the artifact back, time the FIRST call (device compile, served by
the persistent cache on a warm fleet machine) and a warm call, and
parity-check the artifact's output against the directly-jitted program.

Writes benchmarks/aot_chip.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    if not os.environ.get("ALLOW_CPU"):  # CPU smoke-test escape hatch
        assert jax.devices()[0].platform != "cpu", jax.devices()

    from cvmatrix_tpu import CVConfig, fit
    from cvmatrix_tpu.core.batch import training_matrices_batched
    from cvmatrix_tpu.utils import export_program, load_program

    N = int(os.environ.get("BENCH_N", 10_000))
    K = int(os.environ.get("BENCH_K", 100))
    M = int(os.environ.get("BENCH_M", 5))
    P = int(os.environ.get("BENCH_PS", "100"))

    rng = np.random.default_rng(11)
    X = rng.random((N, K))
    Y = rng.random((N, M))
    w = rng.random(N)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    state = fit(cfg, X, Y, w, validate=False)
    idx = jnp.asarray(np.arange(N).reshape(P, N // P))

    def sweep(st, ib):
        return training_matrices_batched(cfg, st, ib, None)

    platform = os.environ.get("AOT_PLATFORM", "tpu")
    path = f"/tmp/cvmatrix_sweep_{platform}.aot"
    t0 = time.perf_counter()
    size = export_program(sweep, (state, idx), path, platforms=[platform])
    t_export = time.perf_counter() - t0

    loaded = load_program(path)
    t0 = time.perf_counter()
    out = loaded(state, idx)
    jax.block_until_ready(out)
    # honest completion barrier on axon: a host scalar fetch
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loaded(state, idx)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
    t_warm = time.perf_counter() - t0

    direct = jax.jit(sweep)(state, idx)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(out))
    )

    row = {
        "platform": jax.devices()[0].platform,
        "N": N, "K": K, "M": M, "P": P,
        "artifact_bytes": size,
        "export_s": round(t_export, 2),
        "first_call_s": round(t_first, 2),
        "warm_call_s": round(t_warm, 4),
        "max_abs_diff_vs_direct": worst,
        "ok": bool(worst < 1e-8),
    }
    print(json.dumps(row), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "aot_chip.json")
    with open(out_path, "w") as fjson:
        json.dump(row, fjson, indent=1)
    assert row["ok"], row
    print("AOT ON-CHIP OK")


if __name__ == "__main__":
    main()
