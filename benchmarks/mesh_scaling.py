"""Mesh scaling-efficiency proxy on virtual CPU devices.

Real multi-chip hardware is not available in this environment (one v5e chip
behind a tunnel), so this measures the SCALING STRUCTURE — how per-device
fold throughput of the single-program mesh sweep
(:func:`cvmatrix_tpu.parallel.distributed.sharded_cross_validate_reduce`)
holds up as the mesh grows — on 1/2/4/8 virtual CPU devices. The proxy
captures every mesh-size-dependent cost the program has (gather psum work,
fold-axis splitting, per-chunk collective latency); what it cannot capture
is real ICI bandwidth. Because all virtual devices share ONE physical CPU,
total compute does not grow with the mesh: ideal virtual scaling is FLAT
folds/s, and ``scaling_efficiency(n) = folds_per_sec(n) / folds_per_sec(1)``
measures the mesh-induced overhead (1.0 = the sharded program adds no cost
over single-device; the BASELINE.json >=80%-at-2-hosts target needs real
chips to measure for the bandwidth term). Measured with the XLA engine (the
Pallas kernels in interpret mode are orders of magnitude off real speed and
would drown the signal).

Each mesh size runs in a fresh subprocess (the virtual device count is fixed
at backend initialisation). Prints one CSV row per size and a JSON summary.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Large enough that a run is tens of ms (a 5 ms run on a shared 1-core
# host measures dispatch jitter, not scaling structure).
N = int(os.environ.get("SCALE_N", 16384))
K = int(os.environ.get("SCALE_K", 64))
M = int(os.environ.get("SCALE_M", 4))
P = int(os.environ.get("SCALE_P", 4096))
SIZES = [int(s) for s in os.environ.get("SCALE_SIZES", "1,2,4,8").split(",")]


def worker(n_dev: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from cvmatrix_tpu import CVConfig
    from cvmatrix_tpu.parallel.distributed import (
        fit_sharded,
        make_mesh,
        sharded_cross_validate_reduce,
    )

    assert len(jax.devices()) >= n_dev
    mesh = make_mesh(jax.devices()[:n_dev])
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    rng = np.random.default_rng(0)
    st = fit_sharded(cfg, mesh, rng.random((N, K)), rng.random((N, M)),
                     rng.random(N))
    idx = np.arange(P)[:, None] % N

    def trace_reduce(mats, stats):
        # A stable function object: the sharded program cache is keyed on
        # reduce_fn identity, so a fresh lambda per call would recompile.
        return jnp.trace(mats[0])

    def run():
        red = sharded_cross_validate_reduce(
            cfg, st, idx, mesh=mesh, reduce_fn=trace_reduce,
            batch_size=128, impl="xla",
        )
        return float(jnp.sum(red))  # host fetch = completion barrier

    run()  # compile
    # Best of several multi-rep blocks: the virtual devices share one CPU
    # with whatever else the host runs, so a single block can absorb an
    # unrelated scheduling stall; the fastest block is the least-noise
    # estimate of the program's own cost.
    reps = int(os.environ.get("SCALE_REPS", 5))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            run()
        best = min(best, (time.perf_counter() - t0) / reps)
    print(json.dumps({"n_dev": n_dev, "folds_per_sec": P / best}))


def main() -> None:
    # Interleaved rounds with a per-size best: on a shared host a single
    # pass can hand one mesh size an unrelated CPU stall and skew every
    # efficiency ratio (the baseline divides them all).
    rounds = int(os.environ.get("SCALE_ROUNDS", 3))
    best = {n: 0.0 for n in SIZES}
    for rnd in range(rounds):
        for n_dev in SIZES:
            env = dict(os.environ)
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n_dev}"
            )
            env.pop("JAX_PLATFORMS", None)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 f"--worker={n_dev}"],
                env=env, capture_output=True, text=True, timeout=900,
            )
            if out.returncode != 0 or not out.stdout.strip():
                raise RuntimeError(
                    f"worker n_dev={n_dev} failed (rc={out.returncode});"
                    f" stderr:\n{out.stderr[-4000:]}"
                )
            fps = json.loads(out.stdout.strip().splitlines()[-1])[
                "folds_per_sec"]
            best[n_dev] = max(best[n_dev], fps)
            print(f"round {rnd} n_dev={n_dev} folds/s={fps:.0f}")
    rows = [{"n_dev": n, "folds_per_sec": best[n],
             # Virtual devices share one CPU: flat folds/s == zero mesh
             # overhead.
             "scaling_efficiency": best[n] / best[SIZES[0]]}
            for n in SIZES]
    summary = {"metric": "mesh_scaling_proxy", "rows": rows,
               "config": {"N": N, "K": K, "M": M, "P": P,
                          "rounds": rounds}}
    print(json.dumps(summary))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "mesh_scaling_cpu_proxy.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    for a in sys.argv[1:]:
        if a.startswith("--worker="):
            worker(int(a.split("=")[1]))
            sys.exit(0)
    main()
