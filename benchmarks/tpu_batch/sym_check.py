"""Real-chip check of the symmetric-mirror LOOCV kernel: parity + A/B perf."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import sys; sys.path.insert(0, "/root/repo")
from cvmatrix_tpu import CVConfig, fit
from cvmatrix_tpu.core import batch as B
from cvmatrix_tpu.ops import kernels as KK
from cvmatrix_tpu.ops.df64 import df_to_f64
from cvmatrix_tpu.utils import enable_persistent_cache
enable_persistent_cache()

N, K, M, F, BS = 100_000, 500, 10, 50_000, 500
rng = np.random.default_rng(42)
X = rng.random((N, K)); Y = rng.random((N, M)); w = rng.random(N)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
st = fit(cfg, X, Y, w, validate=False)
idx = jnp.arange(F, dtype=jnp.int32).reshape(F, 1)
src = B.prepare_loocv_sources(cfg, st, idx, presplit=True)
print("kp", src.kp, flush=True)
rows_all = idx[:, 0]
n_chunks = F // BS

# ---- parity on 4 folds vs the XLA engine ----
small = np.array([0, 17, 1234, 99_999])[:, None]
pair = KK.fused_loocv_df64_sym(
    jnp.asarray(small[:, 0], jnp.int32), src.total4, src.xw, src.xu,
    src.yu, src.yw, src.gx, src.gy, src.ymask,
    B.prepare_loocv_sources(cfg, st, small, presplit=True).scal,
    center_xtx=True, center_xty=True, scale_x=True, scale_y=True,
    with_y=True, resolution=cfg.resolution, bt=256)
got = np.asarray(df_to_f64(pair[:, 0], pair[:, 1]))[:, :K, :K + M]
(rx, ry), _ = B.training_matrices_batched(cfg, st, small, None, impl="xla")
ref = np.concatenate([np.asarray(rx), np.asarray(ry)], axis=2)
scale = np.max(np.abs(ref))
err = np.max(np.abs(got - ref)) / scale
print(f"sym parity vs XLA engine: {err:.3e} relative", flush=True)
assert err < 1e-10, err
# symmetry of the X block
sym_err = np.max(np.abs(got[:, :K, :K] - np.swapaxes(got[:, :K, :K], 1, 2)))
print(f"X-block asymmetry: {sym_err:.3e}", flush=True)

# ---- A/B timing: full kernel vs sym kernel ----
def runner(kern, **kw):
    @jax.jit
    def run(rows_all, scal_all):
        def body(c, carry):
            ci = jax.lax.dynamic_slice_in_dim(rows_all, c * BS, BS, 0)
            sc = jax.lax.dynamic_slice_in_dim(scal_all, c * BS, BS, 0)
            return kern(ci, src.total4, src.xw, src.xu, src.yu, src.yw,
                        src.gx, src.gy, src.ymask, sc,
                        center_xtx=True, center_xty=True, scale_x=True,
                        scale_y=True, with_y=True,
                        resolution=cfg.resolution, **kw)
        buf = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((BS, 2, src.kp, src.cp), jnp.float32))
        return buf.reshape(-1)[0]
    return run

for name, kern, kw in [("full", KK.fused_loocv_df64, {}),
                       ("sym256", KK.fused_loocv_df64_sym, {"bt": 256}),
                       ("sym128", KK.fused_loocv_df64_sym, {"bt": 128})]:
    run = runner(kern, **kw)
    float(run(rows_all, src.scal))
    t0 = time.perf_counter(); float(run(rows_all, src.scal))
    dt = time.perf_counter() - t0
    gbps = F * src.kp * src.cp * 8 / dt / 1e9
    print(f"{name}: {dt:.3f}s for {F} folds = {dt/F*1e6:.2f} us/fold, "
          f"{F/dt:,.0f} folds/s, {gbps:.0f} GB/s stores", flush=True)

# ---- v3 kernel A/B (mid-band fold sizes) ----
from cvmatrix_tpu.core.batch import (
    gather_ozaki_rows, prepare_ozaki_sources,
)

for P, folds_timed in ((1000, 1000), (10000, 4000)):
    L = N // P
    idxP = np.arange(folds_timed * L, dtype=np.int32).reshape(folds_timed, L)
    srcP = prepare_ozaki_sources(cfg, st, idxP)
    rowsP = jnp.asarray(srcP.idx.reshape(-1), jnp.int32)
    lpP = srcP.idx.shape[1]
    bsP = min(500, folds_timed)
    nchP = folds_timed // bsP

    def v3_runner(kern, **kw2):
        @jax.jit
        def run(rows_flat, sxv, yvec, scal):
            def body(c, carry):
                rw = jax.lax.dynamic_slice_in_dim(
                    rows_flat, c * bsP * lpP, bsP * lpP, 0)
                sx = jax.lax.dynamic_slice_in_dim(sxv, c * bsP, bsP, 0)
                yv = jax.lax.dynamic_slice_in_dim(yvec, c * bsP, bsP, 0)
                sc = jax.lax.dynamic_slice_in_dim(scal, c * bsP, bsP, 0)
                sa, sb = gather_ozaki_rows(srcP.saN, srcP.sbN_rev, rw)
                return kern(srcP.total2, sa, sb, srcP.pa, srcP.pb, srcP.gx,
                            sx, yv, srcP.ymask, sc,
                            center_xtx=True, center_xty=True, scale_x=True,
                            scale_y=True, with_y=True,
                            resolution=cfg.resolution, **kw2)
            buf = jax.lax.fori_loop(
                0, nchP, body,
                jnp.zeros((bsP, 2, srcP.saN.shape[2], srcP.sbN_rev.shape[2]),
                          jnp.float32))
            return buf.reshape(-1)[0]
        return run

    vals = {}
    for name, kern, kw2 in [("v3_full", KK.fused_ozaki_downdate_v3, {}),
                            ("v3_sym", KK.fused_ozaki_downdate_v3_sym,
                             {"bt": 256})]:
        run = v3_runner(kern, **kw2)
        vals[name] = float(run(rowsP, srcP.sxv, srcP.yvec, srcP.scal))
        t0 = time.perf_counter()
        float(run(rowsP, srcP.sxv, srcP.yvec, srcP.scal))
        dt = time.perf_counter() - t0
        print(f"P={P} {name}: {dt:.3f}s for {folds_timed} folds = "
              f"{dt/folds_timed*1e6:.2f} us/fold", flush=True)
    print(f"P={P} probe agree: {abs(vals['v3_full'] - vals['v3_sym']):.3e} "
          f"(values {vals['v3_full']:.6g})", flush=True)

# ---- f32 engine A/B: one vs two folds per grid step ----
cfg32 = CVConfig(True, True, True, True, ddof=1, dtype=np.float32)
st32 = fit(cfg32, X.astype(np.float32), Y.astype(np.float32),
           w.astype(np.float32), validate=False)
src32 = B.prepare_loocv_sources(cfg32, st32, idx, presplit=False)

def f32_runner(two):
    @jax.jit
    def run(rows_all, scal_all):
        def body(c, carry):
            ci = jax.lax.dynamic_slice_in_dim(rows_all, c * BS, BS, 0)
            sc = jax.lax.dynamic_slice_in_dim(scal_all, c * BS, BS, 0)
            return B.loocv_f32_from_sources(
                cfg32, src32, ci, sc, return_XTY=True, two_per_step=two)
        buf = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros((BS, src32.kp, src32.cp),
                                          jnp.float32))
        return buf.reshape(-1)[0]
    return run

for name, two in (("f32x1", False), ("f32x2", True)):
    run = f32_runner(two)
    float(run(rows_all, src32.scal))
    t0 = time.perf_counter(); float(run(rows_all, src32.scal))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f}s for {F} folds = {dt/F*1e6:.2f} us/fold, "
          f"{F/dt:,.0f} folds/s", flush=True)
