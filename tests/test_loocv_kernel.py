"""The all-in-one LOOCV kernel: math parity, wiring, and df64 primitives.

The kernel's math is verified through :func:`fused_loocv_df64_reference`,
an EAGER twin of the Pallas kernel body (same code path via
``_loocv_fold_math``). Eager execution is the faithful CPU model: Pallas
interpret mode on CPU executes f32 chains with FMA/excess precision
(measured: ``a*b + c`` matches the f64-fused result, breaking double-float
compensation by ~1 ulp of the output), while the real TPU VPU has no FMA
(probed) — so eager-rounded f32 is what the hardware computes. The Pallas
call itself is exercised in interpret mode at a loose tolerance purely to
validate operand wiring (index maps, layouts); exact on-hardware parity is
driven on the real chip (see .claude/skills/verify/SKILL.md).
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from cvmatrix_tpu import CVConfig, fit

# Interpret-mode Pallas lattices dominate the suite's wall time; the fast
# PR loop (-m "not slow") keeps kernel coverage via tests/test_batch.py.
pytestmark = pytest.mark.slow
from cvmatrix_tpu.core import batch as B
from cvmatrix_tpu.ops import kernels as KK
from cvmatrix_tpu.ops.df64 import df_from_f64, df_to_f64, df_recip, df_sqrt

N, K, M = 120, 50, 7
rng = np.random.default_rng(11)
X_ALL = rng.normal(size=(N, K)) * 3 + 1
Y_ALL = rng.normal(size=(N, M))
W_ALL = rng.uniform(0, 2, size=N)
W_ALL[::7] = 0.0
IDX = np.array([0, 3, 7, 11, 60, 119])[:, None]


def _run_reference(cfg, st, with_y):
    src = B.prepare_loocv_sources(cfg, st, IDX, return_XTX=True,
                                  return_XTY=with_y)
    pair = KK.fused_loocv_df64_reference(
        IDX[:, 0], src.total4, src.xw, src.xu, src.yu, src.yw,
        src.gx, src.gy, src.ymask, src.scal,
        center_xtx=cfg.center_X,
        center_xty=cfg.center_X or cfg.center_Y,
        scale_x=cfg.scale_X, scale_y=cfg.scale_Y,
        with_y=with_y, resolution=cfg.resolution,
    )
    return np.asarray(df_to_f64(pair[:, 0], pair[:, 1]))


def _xla_reference(cfg, st, with_y):
    return B.training_matrices_batched(
        cfg, st, IDX, None, return_XTX=True, return_XTY=with_y, impl="xla"
    )[0]


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, False, False, False), (False, True, False, False),
    (False, False, True, False), (False, False, False, True),
    (True, True, False, False), (False, False, True, True),
    (True, False, False, True), (False, True, True, False),
])
@pytest.mark.parametrize("use_w", [True, False])
def test_loocv_kernel_math_lattice(flags, use_w):
    """Kernel math (eager twin) vs the XLA engine across the flag lattice."""
    cfg = CVConfig(*flags, ddof=1, dtype=np.float64)
    w = W_ALL if use_w else None
    for with_y in (True, False):
        st = fit(cfg, X_ALL, Y_ALL if with_y else None, w)
        assert B.loocv_single_tile_ok(cfg, st, True, with_y)
        got = _run_reference(cfg, st, with_y)
        ref = _xla_reference(cfg, st, with_y)
        if with_y:
            rx, ry = ref
            assert_allclose(got[:, :K, :K], np.asarray(rx), atol=1e-8)
            assert_allclose(got[:, :K, K:K + M], np.asarray(ry), atol=1e-8)
        else:
            assert_allclose(got[:, :K, :K], np.asarray(ref), atol=1e-8)


def test_loocv_kernel_interpret_wiring():
    """Pallas wiring (index maps, layouts) via interpret mode.

    Loose tolerance: interpret's FMA/excess precision costs ~ulp(out) f32;
    layout bugs would be orders of magnitude larger.
    """
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, W_ALL)
    src = B.prepare_loocv_sources(cfg, st, IDX, return_XTX=True,
                                  return_XTY=True)
    pair = B.loocv_from_sources(cfg, src, jnp.asarray(IDX[:, 0], jnp.int32),
                                return_XTY=True, interpret=True)
    got = np.asarray(df_to_f64(pair[:, 0], pair[:, 1]))
    ref = _run_reference(cfg, st, True)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 1e-5 * max(scale, 1.0)


def test_loocv_gate():
    """Geometry gate: rejects wide-K and XTY-only shapes."""
    cfg = CVConfig(dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, W_ALL)
    assert B.loocv_single_tile_ok(cfg, st, True, True)
    assert not B.loocv_single_tile_ok(cfg, st, False, True)  # XTY-only
    cfg32 = CVConfig(dtype=np.float32)
    st32 = fit(cfg32, X_ALL.astype(np.float32), Y_ALL.astype(np.float32))
    # geometry-only gate: the f32 engine shares it (dtype picks the kernel)
    assert B.loocv_single_tile_ok(cfg32, st32, True, True)
    mid = fit(cfg, rng.normal(size=(40, 600)), None, None)
    # K=600 -> kp == cp == 640 <= 1024 for XTX-only: eligible.
    assert B.loocv_single_tile_ok(cfg, mid, True, False)
    wide = fit(cfg, rng.normal(size=(40, 1100)), None, None)
    assert not B.loocv_single_tile_ok(cfg, wide, True, False)  # tile > 1024


def test_df64_recip_sqrt_eager():
    """New double-float primitives: ~2^-45 relative accuracy (eager)."""
    vals = np.abs(rng.normal(size=4096)) * 10.0 ** rng.integers(-6, 6, 4096)
    pair = df_from_f64(jnp.asarray(vals))
    rh, rl = df_recip(*pair)
    rel = np.abs(np.asarray(df_to_f64(rh, rl)) - 1.0 / vals) * np.abs(vals)
    assert rel.max() < 2.0 ** -44
    sh, sl = df_sqrt(*pair)
    rel = np.abs(np.asarray(df_to_f64(sh, sl)) - np.sqrt(vals)) / np.sqrt(vals)
    assert rel.max() < 2.0 ** -44
    zh, zl = df_sqrt(jnp.float32(0.0), jnp.float32(0.0))
    assert float(zh) == 0.0 and float(zl) == 0.0


# --------------------------------------------------------------------------- #
# General small-fold (L > 1) kernel                                           #
# --------------------------------------------------------------------------- #

IDX_L = np.arange(24).reshape(6, 4)        # 6 folds of 4 rows
MASK_L = np.ones((6, 4))
MASK_L[2, 3] = 0.0                          # one padded row
MASK_L[5, 2:] = 0.0                         # two padded rows


def _run_smallfold_reference(cfg, st, with_y, idx, mask):
    src = B.prepare_loocv_sources(cfg, st, idx, mask, return_XTX=True,
                                  return_XTY=with_y, presplit=False)
    pair = KK.fused_smallfold_df64_reference(
        idx, mask, src.total4, src.xw, src.xu, src.yu, src.yw,
        src.gx, src.gy, src.ymask, src.scal,
        center_xtx=cfg.center_X,
        center_xty=cfg.center_X or cfg.center_Y,
        scale_x=cfg.scale_X, scale_y=cfg.scale_Y,
        with_y=with_y, resolution=cfg.resolution,
    )
    return np.asarray(df_to_f64(pair[:, 0], pair[:, 1])), src


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, False, False, False), (False, False, False, True),
    (True, True, False, False), (False, True, True, False),
])
@pytest.mark.parametrize("use_w", [True, False])
@pytest.mark.parametrize("use_mask", [False, True])
def test_smallfold_kernel_math_lattice(flags, use_w, use_mask):
    """Small-fold kernel math (eager twin) vs the XLA engine, incl. masks."""
    cfg = CVConfig(*flags, ddof=1, dtype=np.float64)
    w = W_ALL if use_w else None
    mask = MASK_L if use_mask else None
    for with_y in (True, False):
        st = fit(cfg, X_ALL, Y_ALL if with_y else None, w)
        got, _ = _run_smallfold_reference(cfg, st, with_y, IDX_L, mask)
        ref = B.training_matrices_batched(
            cfg, st, IDX_L, mask, return_XTX=True, return_XTY=with_y,
            impl="xla",
        )[0]
        if with_y:
            rx, ry = ref
            assert_allclose(got[:, :K, :K], np.asarray(rx), atol=1e-8)
            assert_allclose(got[:, :K, K:K + M], np.asarray(ry), atol=1e-8)
        else:
            assert_allclose(got[:, :K, :K], np.asarray(ref), atol=1e-8)


@pytest.mark.parametrize("use_mask", [False, True])
def test_smallfold_kernel_interpret_wiring(use_mask):
    """Pallas wiring of the (F, L) grid, scratch accumulation, masks."""
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, W_ALL)
    mask = MASK_L if use_mask else None
    ref, src = _run_smallfold_reference(cfg, st, True, IDX_L, mask)
    pair = B.smallfold_from_sources(
        cfg, src, jnp.asarray(IDX_L.reshape(-1), jnp.int32),
        n_l=IDX_L.shape[1], return_XTY=True, has_mask=use_mask,
        interpret=True,
    )
    got = np.asarray(df_to_f64(pair[:, 0], pair[:, 1]))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 1e-5 * max(scale, 1.0)


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, False, False, True),
])
def test_f32_loocv_kernel_interpret(flags):
    """f32 all-in-one LOOCV kernel vs the XLA f32 engine (interpret)."""
    cfg = CVConfig(*flags, ddof=1, dtype=np.float32)
    X32 = X_ALL.astype(np.float32)
    Y32 = Y_ALL.astype(np.float32)
    w32 = W_ALL.astype(np.float32)
    st = fit(cfg, X32, Y32, w32)
    src = B.prepare_loocv_sources(cfg, st, IDX, return_XTX=True,
                                  return_XTY=True, presplit=False)
    out = B.loocv_f32_from_sources(
        cfg, src, jnp.asarray(IDX[:, 0], jnp.int32), return_XTY=True,
        interpret=True,
    )
    got = np.asarray(out)
    (rx, ry), _ = B.training_matrices_batched(
        cfg, st, IDX, None, return_XTX=True, return_XTY=True, impl="xla")
    scale = max(np.max(np.abs(np.asarray(rx))), 1.0)
    assert np.max(np.abs(got[:, :K, :K] - np.asarray(rx))) < 1e-4 * scale
    assert np.max(np.abs(got[:, :K, K:K + M] - np.asarray(ry))) < 1e-4 * scale


# --------------------------------------------------------------------------- #
# v3 fused Ozaki kernel (dataset slice planes, prefix-stack products)         #
# --------------------------------------------------------------------------- #

IDX_V3 = np.arange(96).reshape(2, 48)       # 2 folds of 48 rows
MASK_V3 = np.ones((2, 48))
MASK_V3[1, 40:] = 0.0


def _run_v3_reference(cfg, st, with_y, idx, mask):
    src = B.prepare_ozaki_sources(cfg, st, idx, mask, return_XTX=True,
                                  return_XTY=with_y)
    pair = KK.fused_ozaki_v3_reference(
        np.asarray(src.idx), None if src.mask2d is None else
        np.asarray(src.mask2d),
        src.total2, src.saN, src.sbN_rev, src.pa, src.pb, src.gx, src.sxv,
        src.yvec, src.ymask, src.scal,
        center_xtx=cfg.center_X,
        center_xty=cfg.center_X or cfg.center_Y,
        scale_x=cfg.scale_X, scale_y=cfg.scale_Y,
        with_y=with_y, resolution=cfg.resolution,
    )
    return np.asarray(df_to_f64(pair[:, 0], pair[:, 1])), src


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, False, False, False), (False, False, False, True),
    (True, True, False, False), (False, True, True, False),
    (False, False, True, True),
])
@pytest.mark.parametrize("use_w", [True, False])
@pytest.mark.parametrize("use_mask", [False, True])
def test_ozaki_v3_math_lattice(flags, use_w, use_mask):
    """v3 kernel math (eager twin) vs the XLA engine, incl. masks/padding."""
    cfg = CVConfig(*flags, ddof=1, dtype=np.float64)
    w = W_ALL if use_w else None
    mask = MASK_V3 if use_mask else None
    for with_y in (True, False):
        st = fit(cfg, X_ALL, Y_ALL if with_y else None, w)
        assert B.ozaki_v3_ok(cfg, st, True, with_y, IDX_V3.shape[1])
        got, _ = _run_v3_reference(cfg, st, with_y, IDX_V3, mask)
        ref = B.training_matrices_batched(
            cfg, st, IDX_V3, mask, return_XTX=True, return_XTY=with_y,
            impl="xla",
        )[0]
        if with_y:
            rx, ry = ref
            assert_allclose(got[:, :K, :K], np.asarray(rx), atol=1e-8)
            assert_allclose(got[:, :K, K:K + M], np.asarray(ry), atol=1e-8)
        else:
            assert_allclose(got[:, :K, :K], np.asarray(ref), atol=1e-8)


def test_ozaki_v3_interpret_wiring():
    """Pallas wiring of the v3 (F,) grid, gathered stacks, trim, masks."""
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, W_ALL)
    ref, src = _run_v3_reference(cfg, st, True, IDX_V3, MASK_V3)
    pair = B.ozaki_v3_from_sources(cfg, src, return_XTY=True, interpret=True)
    got = np.asarray(df_to_f64(pair[:, 0], pair[:, 1]))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) < 1e-5 * max(scale, 1.0)


def test_ozaki_trim_groups_budget():
    """Trim formula: tail bound within the ACTIVE budget, monotone in
    fold rows (the default budget lives in policy.RoutingPolicy)."""
    from cvmatrix_tpu import policy

    t = KK._OZAKI_T_BITS
    budget = policy().ozaki_budget_log2
    for n_l in (1, 10, 32, 100, 128, 384):
        sp = KK.ozaki_trim_groups(n_l)
        lp = -(-max(n_l, 1) // 32) * 32
        assert 1.2 * (sp + 1) * lp * 2.0 ** (-t * sp) <= 2.0 ** budget
        assert sp <= 10
    assert KK.ozaki_trim_groups(10) <= KK.ozaki_trim_groups(384)


# ---- symmetric-mirror kernel -------------------------------------------- #

def _sym_setup(flags=(True, True, True, True)):
    """K large enough for >= 2 tiles at bt=128 (kp = 384)."""
    n, k, m = 300, 300, 5
    rng2 = np.random.default_rng(5)
    X = rng2.normal(size=(n, k)) * 2 + 0.5
    Y = rng2.normal(size=(n, m))
    w = rng2.uniform(0, 2, size=n)
    cfg = CVConfig(*flags, ddof=1, dtype=np.float64)
    st = fit(cfg, X, Y, w)
    idx = np.array([0, 5, 77, 299])[:, None]
    src = B.prepare_loocv_sources(cfg, st, idx, presplit=True)
    args = (jnp.asarray(idx[:, 0], jnp.int32), src.total4, src.xw, src.xu,
            src.yu, src.yw, src.gx, src.gy, src.ymask, src.scal)
    kw = dict(center_xtx=cfg.center_X,
              center_xty=cfg.center_X or cfg.center_Y,
              scale_x=cfg.scale_X, scale_y=cfg.scale_Y,
              with_y=True, resolution=cfg.resolution)
    return cfg, st, idx, args, kw, k, m


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, True, False, False), (False, False, True, True),
])
def test_sym_reference_matches_full_reference(flags):
    """Sym eager twin == full eager twin up to the mirror asymmetry.

    Computed (upper) tiles are bit-identical; mirrored tiles differ only
    by the ~2^-46 factor-form rounding asymmetry of the X block.
    """
    cfg, st, idx, args, kw, k, m = _sym_setup(flags)
    full = KK.fused_loocv_df64_reference(*args, **kw)
    sym = KK.fused_loocv_df64_sym_reference(*args, **kw, bt=128)
    # Compare the REAL [:K, :K+M] region: mirror tiles write transposed
    # values into padding rows (>= K) where the full kernel writes zeros —
    # every consumer slices [:k, :c] before use (core/batch.py:662-779).
    vf = np.asarray(df_to_f64(full[:, 0], full[:, 1]))[:, :k, :k + m]
    vs = np.asarray(df_to_f64(sym[:, 0], sym[:, 1]))[:, :k, :k + m]
    scale = np.max(np.abs(vf))
    assert np.max(np.abs(vf - vs)) / scale < 1e-11
    # The upper-triangular tiles (incl. Y columns) are bit-identical.
    np.testing.assert_array_equal(np.asarray(sym[:, :, :128, :]),
                                  np.asarray(full[:, :, :128, :]))


def test_sym_kernel_interpret_wiring():
    """Pallas sym kernel wiring: mirror tiles are EXACT transposes and the
    whole output tracks the eager twin at interpret-mode tolerance."""
    cfg, st, idx, args, kw, k, m = _sym_setup()
    out = np.asarray(KK.fused_loocv_df64_sym(*args, **kw, bt=128,
                                             interpret=True))
    ref = np.asarray(KK.fused_loocv_df64_sym_reference(*args, **kw, bt=128))
    vo = out[:, 0].astype(np.float64) + out[:, 1].astype(np.float64)
    vr = ref[:, 0].astype(np.float64) + ref[:, 1].astype(np.float64)
    scale = np.max(np.abs(vr))
    assert np.max(np.abs(vo - vr)) / scale < 1e-5  # interpret FMA noise
    bt = 128
    for i in range(3):
        for j in range(i + 1, 3):
            a = out[:, :, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt]
            b = out[:, :, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt]
            np.testing.assert_array_equal(np.swapaxes(a, 2, 3), b)


def test_sym_kernel_geometry_errors():
    cfg, st, idx, args, kw, k, m = _sym_setup()
    with pytest.raises(ValueError, match="sym kernel"):
        KK.fused_loocv_df64_sym(*args, **kw, bt=384, interpret=True)


# ---- symmetric-mirror v3 kernel ----------------------------------------- #

def _v3_sym_setup(flags=(True, True, True, True)):
    n, k, m = 400, 300, 5   # kp = 384 -> 3 tiles at bt=128
    rng2 = np.random.default_rng(9)
    X = rng2.normal(size=(n, k)) * 2 + 0.5
    Y = rng2.normal(size=(n, m))
    w = rng2.uniform(0, 2, size=n)
    cfg = CVConfig(*flags, ddof=1, dtype=np.float64)
    st = fit(cfg, X, Y, w)
    idx = np.arange(80).reshape(2, 40)
    src = B.prepare_ozaki_sources(cfg, st, idx)
    kw = dict(center_xtx=cfg.center_X,
              center_xty=cfg.center_X or cfg.center_Y,
              scale_x=cfg.scale_X, scale_y=cfg.scale_Y,
              with_y=True, resolution=cfg.resolution)
    return cfg, st, src, kw, k, m


@pytest.mark.parametrize("flags", [
    (True, True, True, True), (False, False, False, False),
    (True, True, False, False), (False, False, True, True),
])
def test_ozaki_v3_sym_reference_matches_full(flags):
    """v3 sym eager twin == full v3 eager twin up to the mirror asymmetry
    (compare the real [:K, :K+M] region — mirrors land in padding rows)."""
    cfg, st, src, kw, k, m = _v3_sym_setup(flags)
    args = (np.asarray(src.idx), None, src.total2, src.saN, src.sbN_rev,
            src.pa, src.pb, src.gx, src.sxv, src.yvec, src.ymask, src.scal)
    full = KK.fused_ozaki_v3_reference(*args, **kw)
    sym = KK.fused_ozaki_v3_sym_reference(*args, **kw, bt=128)
    vf = np.asarray(df_to_f64(full[:, 0], full[:, 1]))[:, :k, :k + m]
    vs = np.asarray(df_to_f64(sym[:, 0], sym[:, 1]))[:, :k, :k + m]
    scale = np.max(np.abs(vf))
    assert np.max(np.abs(vf - vs)) / scale < 1e-11
    # The top row-stripe of tiles is all-computed and bit-identical.
    np.testing.assert_array_equal(np.asarray(sym[:, :, :128, :]),
                                  np.asarray(full[:, :, :128, :]))


def test_ozaki_v3_sym_kernel_interpret_wiring():
    cfg, st, src, kw, k, m = _v3_sym_setup()
    args = (np.asarray(src.idx), None, src.total2, src.saN, src.sbN_rev,
            src.pa, src.pb, src.gx, src.sxv, src.yvec, src.ymask, src.scal)
    ref = np.asarray(KK.fused_ozaki_v3_sym_reference(*args, **kw, bt=128))
    from cvmatrix_tpu.core.batch import gather_ozaki_rows
    sa, sb = gather_ozaki_rows(src.saN, src.sbN_rev,
                               src.idx.reshape(-1).astype(np.int32))
    out = np.asarray(KK.fused_ozaki_downdate_v3_sym(
        src.total2, sa, sb, src.pa, src.pb, src.gx, src.sxv, src.yvec,
        src.ymask, src.scal, **kw, bt=128, interpret=True))
    vo = out[:, 0].astype(np.float64) + out[:, 1].astype(np.float64)
    vr = ref[:, 0].astype(np.float64) + ref[:, 1].astype(np.float64)
    scale = np.max(np.abs(vr))
    assert np.max(np.abs(vo - vr)) / scale < 1e-5  # interpret FMA noise
    bt = 128
    for i in range(3):
        for j in range(i + 1, 3):
            a = out[:, :, i * bt:(i + 1) * bt, j * bt:(j + 1) * bt]
            b = out[:, :, j * bt:(j + 1) * bt, i * bt:(i + 1) * bt]
            np.testing.assert_array_equal(np.swapaxes(a, 2, 3), b)


def test_f32_loocv_x2_matches_single(flags=(True, True, True, True)):
    """Two-folds-per-step f32 kernel == the single-fold kernel exactly
    (identical math per fold; interpret mode compares kernel-to-kernel,
    so FMA noise cancels)."""
    cfg = CVConfig(*flags, ddof=1, dtype=np.float32)
    st = fit(cfg, X_ALL.astype(np.float32), Y_ALL.astype(np.float32),
             W_ALL.astype(np.float32))
    idx = np.array([0, 3, 7, 11, 60, 119])[:, None]
    src = B.prepare_loocv_sources(cfg, st, idx, presplit=False)
    rows = jnp.asarray(idx[:, 0], jnp.int32)
    one = np.asarray(B.loocv_f32_from_sources(
        cfg, src, rows, return_XTY=True, interpret=True))
    two = np.asarray(B.loocv_f32_from_sources(
        cfg, src, rows, return_XTY=True, two_per_step=True, interpret=True))
    np.testing.assert_array_equal(one, two)


def test_f32_loocv_x2_rejects_odd():
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float32)
    st = fit(cfg, X_ALL.astype(np.float32), Y_ALL.astype(np.float32))
    idx = np.array([0, 3, 7])[:, None]
    src = B.prepare_loocv_sources(cfg, st, idx, presplit=False)
    with pytest.raises(ValueError, match="even"):
        B.loocv_f32_from_sources(cfg, src, jnp.asarray(idx[:, 0], jnp.int32),
                                 return_XTY=True, two_per_step=True,
                                 interpret=True)


def test_df64x2_kernel_interpret_matches_single():
    """Two-folds-per-step df64 kernel vs the single-fold kernel, both in
    interpret mode: the fold body is shared, so the outputs must be
    BIT-identical (same op sequence per fold, only the grid differs)."""
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, W_ALL)
    src = B.prepare_loocv_sources(cfg, st, IDX, return_XTX=True,
                                  return_XTY=True)
    rows = jnp.asarray(IDX[:, 0], jnp.int32)  # 6 folds: even
    one = B.loocv_from_sources(cfg, src, rows, return_XTY=True,
                               interpret=True)
    two = B.loocv_from_sources(cfg, src, rows, return_XTY=True,
                               two_per_step=True, interpret=True)
    assert np.array_equal(np.asarray(one), np.asarray(two))
    with pytest.raises(ValueError, match="even"):
        B.loocv_from_sources(cfg, src, rows[:3], return_XTY=True,
                             two_per_step=True, interpret=True)
