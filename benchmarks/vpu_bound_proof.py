"""Is the TTTT LOOCV fold kernel VPU-issue-rate bound? A measured proof.

The fused LOOCV downdate kernel (:func:`cvmatrix_tpu.ops.kernels.
fused_loocv_df64`) sustains ~345 GB/s of stores for the all-flags (TTTT)
configuration against a ~443-540 GB/s measured pure-store ceiling. This
script settles WHY, with a controlled experiment: run the SAME kernel
geometry (grid, BlockSpecs, input/output shapes and therefore identical
HBM traffic) at four epilogue flop counts — the four center/scale flag
combinations — plus a flop-free copy kernel, and regress per-fold time on
per-fold VPU flops.

If the fit is linear with a slope matching the VPU's peak issue rate, the
TTTT configuration is arithmetic-bound at the hardware's speed of light
and the store-bandwidth gap is irreducible without dropping precision:
the double-float epilogue needs ~83 VPU flops per output element because
the v5e VPU has no single-rounding FMA (probed; Dekker TwoProd costs ~17
flops where an FMA machine pays 2).

VPU peak model (v5e): 8x128 lanes x 4 ALUs x 940 MHz = 3.85 Tflop/s
(override with BENCH_VPU_PEAK). Flop counts per output element follow the
kernel's cost model (``fused_loocv_df64``): 34 base + 17 if centering
+ 32 if scaling.

Writes one JSON object to benchmarks/vpu_bound_proof.json and prints a
human summary. Run on the real chip (the axon tunnel); interpret-mode
numbers are meaningless.
"""

import functools
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

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cvmatrix_tpu import CVConfig, fit
    from cvmatrix_tpu.core.batch import prepare_loocv_sources
    from cvmatrix_tpu.ops import kernels

    N = int(os.environ.get("BENCH_N", 100_000))
    K = int(os.environ.get("BENCH_K", 500))
    M = int(os.environ.get("BENCH_M", 10))
    F = int(os.environ.get("BENCH_F", 50_000))  # folds timed per variant
    BS = int(os.environ.get("BENCH_BATCH", 500))
    vpu_peak = float(os.environ.get("BENCH_VPU_PEAK", 8 * 128 * 4 * 0.94e9))

    rng = np.random.default_rng(42)
    X = rng.random((N, K))
    Y = rng.random((N, M))
    w = rng.random(N)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    state = fit(cfg, X, Y, w, validate=False)
    idx = jnp.arange(F, dtype=jnp.int32).reshape(F, 1)
    # TTTT sources are a superset: every variant reads the same buffers.
    src = prepare_loocv_sources(cfg, state, idx, presplit=True)
    kp, cp = src.kp, src.cp
    rows_all = idx[:, 0]
    n_chunks = F // BS

    def copy_kernel(idx_ref, total_ref, xw_ref, xu_ref, yu_ref, yw_ref,
                    gx_ref, gy_ref, ymask_ref, scal_ref, out_ref):
        # Touch every input ref the real kernel declares (identical
        # operand traffic), do ~zero VPU work, store both output planes.
        bias = (xw_ref[0, 0, 0] + xu_ref[0, 0, 0] + yu_ref[0, 0, 0]
                + yw_ref[0, 0, 0] + gx_ref[0, 0] + gy_ref[0, 0]
                + ymask_ref[0, 0] + scal_ref[0, 0, 0]) * 0.0
        out_ref[0, 0] = total_ref[0] + bias
        out_ref[0, 1] = total_ref[1]

    n_planes = src.total4.shape[0]
    row = lambda f, idx_ref: (idx_ref[f], f * 0, f * 0)  # noqa: E731
    const3 = lambda f, idx_ref: (f * 0, f * 0, f * 0)  # noqa: E731
    const2 = lambda f, idx_ref: (f * 0, f * 0)  # noqa: E731

    @functools.partial(jax.jit, static_argnums=())
    def copy_call(rows, total4, xw, xu, yu, yw, gx, gy, ymask, scal):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows.shape[0],),
            in_specs=[
                pl.BlockSpec((n_planes, kp, cp), const3),
                pl.BlockSpec((1, 2, kp), row),
                pl.BlockSpec((1, 2, kp), row),
                pl.BlockSpec((1, 2, cp), row),
                pl.BlockSpec((1, 2, cp), row),
                pl.BlockSpec((4, kp), const2),
                pl.BlockSpec((4, cp), const2),
                pl.BlockSpec((1, cp), const2),
                pl.BlockSpec((1, 1, 128), lambda f, idx_ref: (f, f * 0, f * 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 2, kp, cp), lambda f, idx_ref: (f, f * 0, f * 0, f * 0)
            ),
        )
        return pl.pallas_call(
            copy_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (rows.shape[0], 2, kp, cp), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(rows, total4, xw, xu, yu, yw, gx, gy, ymask, scal)

    def variant_runner(flags):
        """One-probe sweep over F folds at the given epilogue flags."""

        @jax.jit
        def run(rows_all, scal_all):
            def body(c, carry):
                ci = jax.lax.dynamic_slice_in_dim(rows_all, c * BS, BS, 0)
                sc = jax.lax.dynamic_slice_in_dim(scal_all, c * BS, BS, 0)
                if flags is None:
                    return copy_call(
                        ci, src.total4, src.xw, src.xu, src.yu, src.yw,
                        src.gx, src.gy, src.ymask, sc,
                    )
                cx, cy, sx, sy = flags
                return kernels.fused_loocv_df64(
                    ci, src.total4, src.xw, src.xu, src.yu, src.yw,
                    src.gx, src.gy, src.ymask, sc,
                    center_xtx=cx, center_xty=cx or cy, scale_x=sx,
                    scale_y=sy, with_y=True, resolution=cfg.resolution,
                )

            buf = jax.lax.fori_loop(
                0, n_chunks, body, jnp.zeros((BS, 2, kp, cp), jnp.float32)
            )
            return buf.reshape(-1)[0]

        return run

    def flops_per_elem(flags):
        if flags is None:
            return 0
        cx, cy, sx, sy = flags
        return 34 + (17 if (cx or cy) else 0) + (32 if (sx or sy) else 0)

    # Real-kernel variants FIRST (programs of the same family as the
    # product sweep, which compiles reliably); the synthetic copy kernel
    # LAST — it crashed the remote compile helper in rounds 3-5 (broken
    # pipe mid-compile), and with this ordering a crash only costs the
    # measured zero-flop floor, not the whole proof. BENCH_SKIP_COPY=1
    # omits it outright.
    variants = [
        ("TTTT", (True, True, True, True)),
        ("TTFF", (True, True, False, False)),
        ("FFTT", (False, False, True, True)),
        ("FFFF", (False, False, False, False)),
    ]
    if os.environ.get("BENCH_SKIP_COPY", "0") != "1":
        variants.append(("copy", None))
    out_bytes = 2 * kp * cp * 4  # the store stream per fold
    results = []
    failed = []

    def helper_alive(deadline_s=600):
        """Wait until the remote compile helper answers again."""
        t_end = time.time() + deadline_s
        while time.time() < t_end:
            try:
                float(jnp.arange(8.0).sum() * (1 + len(results)))
                return True
            except Exception:
                time.sleep(30)
        return False

    for name, flags in variants:
        run = variant_runner(flags)
        try:
            float(run(rows_all, src.scal))  # compile + warm
            t0 = time.perf_counter()
            # probe fetch = completion barrier
            float(run(rows_all, src.scal))
            dt = time.perf_counter() - t0
        except Exception as e:  # helper crash: record, recover, continue
            failed.append({"variant": name, "error": repr(e)[:300]})
            print(f"{name}: FAILED ({e!r})", flush=True)
            if not helper_alive():
                print("compile helper did not recover; stopping variants",
                      flush=True)
                break
            continue
        us_fold = dt / F * 1e6
        gbps = out_bytes * F / dt / 1e9
        fl = flops_per_elem(flags)
        results.append({
            "variant": name, "flops_per_elem": fl, "time_s": round(dt, 4),
            "us_per_fold": round(us_fold, 3), "store_gbps": round(gbps, 1),
        })
        print(f"{name}: {fl:3d} flops/elem  {us_fold:7.3f} us/fold  "
              f"{gbps:6.1f} GB/s stores", flush=True)

    if len(results) < 3:
        print(json.dumps({"ok": False, "failed": failed,
                          "variants": results}))
        sys.exit(1)

    # Linear regression of per-fold time on per-fold flops.
    xs = np.array([r["flops_per_elem"] * kp * cp for r in results], float)
    ys = np.array([r["time_s"] / F for r in results], float)
    slope, intercept = np.polyfit(xs, ys, 1)
    implied = 1.0 / slope  # flop/s the VPU actually issues
    pred = intercept + slope * xs
    r2 = 1 - np.sum((ys - pred) ** 2) / np.sum((ys - ys.mean()) ** 2)
    verdict = {
        "kp": kp, "cp": cp, "F": F, "bs": BS,
        "implied_vpu_flops_per_sec": float(f"{implied:.4g}"),
        "vpu_peak_model_flops_per_sec": float(f"{vpu_peak:.4g}"),
        "pct_of_vpu_peak": round(100 * implied / vpu_peak, 1),
        "zero_flop_floor_us": round(intercept * 1e6, 3),
        "r_squared": round(float(r2), 4),
        "variants": results,
        "failed": failed,
    }
    print(json.dumps(verdict))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "vpu_bound_proof.json")
    with open(out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
