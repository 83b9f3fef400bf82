"""Every Pallas kernel must LOWER for the TPU platform — no hardware needed.

``jax.export`` with ``platforms=["tpu"]`` runs the full trace + Mosaic
serialization pipeline on a CPU host, catching index-map legality bugs,
unsupported in-kernel ops (e.g. a weak-typed f64 literal forcing an
f64->f32 cast — a real regression this suite pins), and shape-rule
violations long before a chip sees the program. Machine-code compilation
still happens on device; this is the strongest hardware-free check we
have (interpret mode does not exercise the Mosaic path at all).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvmatrix_tpu import CVConfig, fit
from cvmatrix_tpu.core import batch as B
from cvmatrix_tpu.ops import kernels as KK

N, K, M = 300, 300, 5  # kp = cp = 384: >= 2 tiles for the sym kernels
rng = np.random.default_rng(3)
CFG = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
ST = fit(CFG, rng.random((N, K)), rng.random((N, M)), rng.random(N))
FLAGS = dict(center_xtx=True, center_xty=True, scale_x=True, scale_y=True,
             with_y=True, resolution=CFG.resolution)


def _export_ok(fn, *args):
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module()) > 1000


def _loocv_args():
    idx = jnp.arange(4, dtype=jnp.int32).reshape(4, 1)
    src = B.prepare_loocv_sources(CFG, ST, idx, presplit=True)
    return (idx[:, 0], src.total4, src.xw, src.xu, src.yu, src.yw,
            src.gx, src.gy, src.ymask, src.scal)


@pytest.mark.parametrize("kern,kw", [
    (KK.fused_loocv_df64, {}),
    (KK.fused_loocv_df64_sym, {"bt": 128}),
    (KK.fused_loocv_f32, {}),
])
def test_loocv_kernels_lower_for_tpu(kern, kw):
    _export_ok(functools.partial(kern, **FLAGS, **kw), *_loocv_args())


def test_smallfold_kernel_lowers_for_tpu():
    idx = np.arange(12).reshape(3, 4)
    src = B.prepare_loocv_sources(CFG, ST, idx, presplit=False)
    fn = functools.partial(KK.fused_smallfold_df64, **FLAGS, n_l=4,
                           has_mask=False)
    _export_ok(fn, jnp.asarray(idx.reshape(-1), jnp.int32), src.total4,
               src.xw, src.xu, src.yu, src.yw, src.gx, src.gy, src.ymask,
               src.scal, src.mrow)


@pytest.mark.parametrize("sym", [False, True])
def test_ozaki_v3_kernels_lower_for_tpu(sym):
    idx = np.arange(80).reshape(2, 40)
    src = B.prepare_ozaki_sources(CFG, ST, idx)
    sa, sb = B.gather_ozaki_rows(src.saN, src.sbN_rev,
                                 src.idx.reshape(-1).astype(np.int32))
    kern = (functools.partial(KK.fused_ozaki_downdate_v3_sym, bt=128)
            if sym else KK.fused_ozaki_downdate_v3)
    _export_ok(functools.partial(kern, **FLAGS), src.total2, sa, sb,
               src.pa, src.pb, src.gx, src.sxv, src.yvec, src.ymask,
               src.scal)


def test_packed_downdate_kernel_lowers_for_tpu():
    idx = np.arange(12).reshape(3, 4)
    ops, _ = B.prepare_fold_operands(CFG, ST, idx)
    fn = functools.partial(KK.fused_downdate_df64_packed,
                           center=ops.center, scale=ops.scale,
                           block_k=128, block_c=128)
    _export_ok(fn, ops.total4, ops.u, ops.v, ops.kvec, ops.cvec)


def test_slice_rows_kernel_lowers_for_tpu():
    from cvmatrix_tpu.ops.df64 import df_from_f64
    from cvmatrix_tpu.ops.precise import _column_scale, _pow2

    x = jnp.asarray(rng.random((256, 384)))
    e = _column_scale(x)
    hi, lo = df_from_f64(x * _pow2(-e)[None, :])
    h1 = jnp.clip(e, -127, 127)
    pows = jnp.stack([jnp.ldexp(jnp.float32(1.0), h1),
                      jnp.ldexp(jnp.float32(1.0), e - h1)])
    _export_ok(functools.partial(KK.slice_rows, n_slices=10), hi, lo, pows)


def test_f32x2_kernel_lowers_for_tpu():
    cfg32 = CVConfig(True, True, True, True, ddof=1, dtype=np.float32)
    st32 = fit(cfg32, rng.random((64, K), np.float32).astype(np.float32),
               rng.random((64, M)).astype(np.float32))
    idx = jnp.arange(4, dtype=jnp.int32).reshape(4, 1)
    src = B.prepare_loocv_sources(cfg32, st32, idx, presplit=False)
    fn = functools.partial(KK.fused_loocv_f32x2, **FLAGS)
    _export_ok(fn, idx[:, 0], src.total4, src.xw, src.xu, src.yu, src.yw,
               src.gx, src.gy, src.ymask, src.scal)


def test_syrk_contraction_lowers_for_tpu():
    """The SYRK (mirrored) exact contraction is pure XLA, but its f64
    scale/slice helpers must survive the TPU x64 rewriter (which rejects
    s64 bitcast tricks); k=4096 gives two column blocks so the mirrored
    assembly path is in the exported module."""
    from cvmatrix_tpu.ops.precise import symmetric_contract

    a = jnp.asarray(rng.random((64, 4096)))
    b = jnp.asarray(rng.random((64, 4101)))
    _export_ok(lambda a_, b_: symmetric_contract(a_, b_, 4096), a, b)


def test_df64x2_kernel_lowers_for_tpu():
    idx = jnp.arange(4, dtype=jnp.int32).reshape(4, 1)
    src = B.prepare_loocv_sources(CFG, ST, idx, presplit=True)
    fn = functools.partial(KK.fused_loocv_df64x2, **FLAGS)
    _export_ok(fn, idx[:, 0], src.total4, src.xw, src.xu, src.yu, src.yw,
               src.gx, src.gy, src.ymask, src.scal)
