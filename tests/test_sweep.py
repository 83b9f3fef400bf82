"""High-level sweep driver: full coverage, both batching modes."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from cvmatrix_tpu import CVConfig, CVMatrix, Partitioner, fit
from cvmatrix_tpu.models.sweep import (
    cross_validate,
    cross_validate_dict,
    cross_validate_reduce,
    materialize_cv,
    materialize_sweep,
)

from .data import make_dataset

X_ALL, Y_ALL, FOLDS, WEIGHTS = make_dataset()


@pytest.mark.parametrize("use_padding", [False, True])
def test_sweep_matches_eager(use_padding):
    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    ref = CVMatrix().fit(X_ALL[:, :5], Y_ALL, WEIGHTS)
    p = Partitioner(FOLDS)
    results = cross_validate_dict(cfg, st, p, use_padding=use_padding)
    assert set(results) == set(p.folds_dict)
    for k, ((xtx, xty), stats) in results.items():
        (rx, ry), rstats = ref.training_XTX_XTY(p.get_validation_indices(k))
        assert_allclose(np.asarray(xtx), np.asarray(rx), atol=1e-10)
        assert_allclose(np.asarray(xty), np.asarray(ry), atol=1e-10)
        for a, b in zip(stats, rstats):
            if b is not None:
                assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_sweep_chunking_covers_all_folds():
    cfg = CVConfig(False, False, False, False, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    p = Partitioner(np.arange(X_ALL.shape[0]) % 97)  # LOOCV-ish, many folds
    seen = []
    for keys, out in cross_validate(cfg, st, p, batch_size=10):
        seen.extend(keys)
        assert out[0][0].shape[0] == len(keys)
    assert sorted(seen) == sorted(p.folds_dict)


@pytest.mark.parametrize("batch_size", [3, 7, 64])
def test_reduce_sweep_matches_eager(batch_size):
    """Single-dispatch on-device sweep: reductions match per-fold eager."""
    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    ref = CVMatrix().fit(X_ALL[:, :5], Y_ALL, WEIGHTS)
    p = Partitioner(np.arange(X_ALL.shape[0]) % 13)  # 13 equal-size folds
    keys, idx, mask = p.padded_batches()

    def reduce_fn(mats, stats):
        xtx, xty = mats
        # a downstream-style reduction: ridge-ish solve statistic + traces
        return {
            "tr": np.trace(np.eye(5)) * 0 + xtx.trace(),
            "xty0": xty[:, 0],
            "mX": stats[0],
        }

    out = cross_validate_reduce(
        cfg, st, idx, mask, reduce_fn=reduce_fn, batch_size=batch_size
    )
    assert out["tr"].shape == (len(keys),)
    assert out["xty0"].shape == (len(keys), 5)
    for i, k in enumerate(keys):
        (rx, ry), rstats = ref.training_XTX_XTY(p.get_validation_indices(k))
        assert_allclose(float(out["tr"][i]), float(np.trace(rx)), atol=1e-10)
        assert_allclose(np.asarray(out["xty0"][i]), np.asarray(ry)[:, 0],
                        atol=1e-10)
        assert_allclose(np.asarray(out["mX"][i]), np.asarray(rstats[0]),
                        atol=1e-10)


def test_reduce_sweep_unequal_folds_masked():
    """Padded+masked heterogeneous folds through the scan sweep."""
    cfg = CVConfig(True, False, False, True, 0)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    ref = CVMatrix(True, False, False, True, 0).fit(X_ALL[:, :5], Y_ALL,
                                                    WEIGHTS)
    p = Partitioner(FOLDS)  # 3 unequal folds -> mask path
    keys, idx, mask = p.padded_batches()
    assert mask is not None
    out = cross_validate_reduce(
        cfg, st, idx, mask, reduce_fn=lambda mats, stats: mats, batch_size=2
    )
    for i, k in enumerate(keys):
        (rx, ry), _ = ref.training_XTX_XTY(p.get_validation_indices(k))
        assert_allclose(np.asarray(out[0][i]), np.asarray(rx), atol=1e-10)
        assert_allclose(np.asarray(out[1][i]), np.asarray(ry), atol=1e-10)


def test_materialize_sweep_probe():
    """Benchmark primitive: covers all folds; fold count padded to the
    chunk size by repeating the last fold (one compiled program)."""
    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    ref = CVMatrix().fit(X_ALL[:, :5], Y_ALL, WEIGHTS)
    idx = np.arange(37)[:, None]  # LOOCV over 37 rows, batch 10 -> pad to 40
    probe = float(materialize_sweep(cfg, st, idx, batch_size=10))
    assert np.isfinite(probe)
    # The probe is the final chunk buffer's first element per output: the
    # last chunk holds folds 30..36 (+3 repeats of 36), so fold 30 leads.
    (x30, y30), _ = ref.training_XTX_XTY(idx[30])
    expect = float(x30[0, 0] + y30[0, 0])
    assert_allclose(probe, expect, rtol=1e-12)


def test_sweep_xtx_only():
    cfg = CVConfig(True, False, True, False, 1)
    st = fit(cfg, X_ALL[:, :5], None, None)
    p = Partitioner(FOLDS)
    d = cross_validate_dict(cfg, st, p, return_XTY=False)
    ref = CVMatrix(True, False, True, False, 1).fit(X_ALL[:, :5], None, None)
    for k, (xtx, stats) in d.items():
        rx, _ = ref.training_XTX(p.get_validation_indices(k))
        assert_allclose(np.asarray(xtx), np.asarray(rx), atol=1e-10)


def test_materialize_cv_matches_fit_plus_sweep():
    """Fused fit+sweep probe equals the separate fit -> materialize_sweep."""
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    n = X_ALL.shape[0]
    P = 10
    idx = np.stack([np.where(np.arange(n) % P == f)[0] for f in range(P)])
    p1 = float(materialize_sweep(cfg, st, idx))
    p2 = float(materialize_cv(cfg, X_ALL, Y_ALL, WEIGHTS, idx))
    assert abs(p1 - p2) <= 1e-9 * max(1.0, abs(p1))


def test_contract_from_planes_matches_fit_products():
    """Shared-plane fit products are f64-grade vs the standard fit."""
    from cvmatrix_tpu.core.batch import contract_from_planes, dataset_planes

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    planes = dataset_planes(cfg, st, with_y=True, n_slices=10)
    prod = np.asarray(contract_from_planes(planes))
    k, m = st.K, st.M
    ref = np.concatenate([np.asarray(st.XTX), np.asarray(st.XTY)], axis=1)
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(prod[:k, :k + m] - ref)) / scale < 1e-14


def test_prepare_ozaki_sources_shared_planes_identical():
    """prepare with externally-built (full 10-slice) planes is bit-identical."""
    from cvmatrix_tpu.core import batch as B

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    idx = np.arange(96).reshape(2, 48)
    planes = B.dataset_planes(cfg, st, with_y=True, n_slices=10)
    s1 = B.prepare_ozaki_sources(cfg, st, idx)
    s2 = B.prepare_ozaki_sources(cfg, st, idx, planes=planes)
    for name in ("saN", "sbN_rev", "pa", "pb", "gx", "sxv", "yvec",
                 "ymask", "scal", "total2"):
        a, b = np.asarray(getattr(s1, name)), np.asarray(getattr(s2, name))
        np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize(
    "weighted,dtype,xtx_only",
    [(False, np.float64, False), (True, np.float32, False),
     (True, np.float64, True)],
)
def test_materialize_cv_variants(weighted, dtype, xtx_only):
    """Fused driver parity off the shared-planes path (unweighted / f32 /
    XTX-only all take the fallback fit-in-program route on CPU)."""
    cfg = CVConfig(True, True, False, True, ddof=0, dtype=dtype)
    w = WEIGHTS if weighted else None
    st = fit(cfg, X_ALL, Y_ALL, w)
    n = X_ALL.shape[0]
    idx = np.stack([np.where(np.arange(n) % 8 == f)[0] for f in range(8)])
    kw = dict(return_XTX=True, return_XTY=not xtx_only)
    p1 = float(materialize_sweep(cfg, st, idx, **kw))
    p2 = float(materialize_cv(cfg, X_ALL, Y_ALL, w, idx, **kw))
    tol = 1e-9 if dtype == np.float64 else 1e-4
    assert abs(p1 - p2) <= tol * max(1.0, abs(p1))


def test_materialize_cv_rejects_negative_weights():
    """The fused driver enforces the host-side weight contract (the inner
    fit runs validate=False under jit, so the check must happen eagerly)."""
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    w = np.array(WEIGHTS, copy=True)
    w[3] = -1.0
    idx = np.arange(40).reshape(4, 10)
    with pytest.raises(ValueError, match="non-negative"):
        materialize_cv(cfg, X_ALL, Y_ALL, w, idx)
    # rejects jax arrays too, and a failing buffer is never memoized
    import jax.numpy as jnp

    wj = jnp.asarray(w)
    for _ in range(2):
        with pytest.raises(ValueError, match="non-negative"):
            materialize_cv(cfg, X_ALL, Y_ALL, wj, idx)


def test_materialize_cv_weight_validation_memoized():
    """A committed weights buffer pays the validation fetch ONCE: repeat
    sweeps with the same array skip the blocking device round trip
    (~30 ms over a remote tunnel), and validate=False skips it outright."""
    import jax.numpy as jnp

    from cvmatrix_tpu.models import sweep as S

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    idx = np.arange(40).reshape(4, 10)
    wj = jnp.asarray(WEIGHTS)
    p1 = float(materialize_cv(cfg, X_ALL, Y_ALL, wj, idx))
    assert S._weights_validated(wj)
    p2 = float(materialize_cv(cfg, X_ALL, Y_ALL, wj, idx))
    p3 = float(materialize_cv(cfg, X_ALL, Y_ALL, wj, idx, validate=False))
    assert p1 == p2 == p3


def test_prepare_ozaki_sources_rejects_thin_planes():
    """Shared planes built with fewer slices than the fold budget needs."""
    from cvmatrix_tpu.core import batch as B

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    idx = np.arange(96).reshape(2, 48)
    thin = B.dataset_planes(cfg, st, with_y=True, n_slices=3)
    with pytest.raises(ValueError, match="slices"):
        B.prepare_ozaki_sources(cfg, st, idx, planes=thin)


def test_sym_knob_routes_v3_sym_kernel(monkeypatch):
    """CVMATRIX_TPU_SYM_LOOCV routing wiring: ozaki_v3_from_sources picks
    the sym kernel (with the right tile size) when the knob is on."""
    from cvmatrix_tpu.core import batch as B
    from cvmatrix_tpu.ops import kernels as KK

    n, k, m = 400, 300, 5
    rng2 = np.random.default_rng(2)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, rng2.random((n, k)), rng2.random((n, m)), rng2.random(n))
    idx = np.arange(80).reshape(2, 40)
    src = B.prepare_ozaki_sources(cfg, st, idx)

    called = {}
    real = KK.fused_ozaki_downdate_v3_sym

    def spy(*a, bt, **kw):
        called["bt"] = bt
        return real(*a, bt=bt, **kw)

    monkeypatch.setattr(B, "_sym_enabled", lambda: True)
    monkeypatch.setattr(KK, "fused_ozaki_downdate_v3_sym", spy)
    pair = B.ozaki_v3_from_sources(cfg, src, return_XTY=True, interpret=True)
    assert called["bt"] == B.loocv_sym_tile(src.kp) == 128
    monkeypatch.setattr(B, "_sym_enabled", lambda: False)
    full = B.ozaki_v3_from_sources(cfg, src, return_XTY=True, interpret=True)
    v1 = np.asarray(pair[:, 0] + pair[:, 1], dtype=np.float64)[:, :k, :k + m]
    v2 = np.asarray(full[:, 0] + full[:, 1], dtype=np.float64)[:, :k, :k + m]
    scale = np.max(np.abs(v2))
    assert np.max(np.abs(v1 - v2)) / scale < 1e-5  # interpret tolerance


def test_df64x2_knob_routes_two_per_step(monkeypatch):
    """CVMATRIX_TPU_DF64X2 routing wiring: the sweep's df64 LOOCV branch
    passes two_per_step=True (even chunk) when the knob is on."""
    import jax.numpy as jnp

    from cvmatrix_tpu.core import batch as B

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    n_folds = 9  # odd: the driver must bump the chunk to even
    idx = jnp.asarray(np.arange(n_folds)[:, None])

    seen = {}

    def spy(config, src, rows, scal_slice=None, *, return_XTY,
            two_per_step=False, interpret=False):
        seen["two"] = two_per_step
        seen["bs"] = int(rows.shape[0])
        f = rows.shape[0]
        return jnp.zeros((f, 2, src.kp, src.cp), jnp.float32)

    monkeypatch.setattr(B, "_df64x2_enabled", lambda: True)
    monkeypatch.setattr(B, "loocv_from_sources", spy)
    from cvmatrix_tpu.models.sweep import _materialize_sweep_impl, _pad_folds
    bs = 10  # what the driver computes after the even bump of 9
    idx_p, _ = _pad_folds(idx, None, bs)
    _materialize_sweep_impl(cfg, bs, idx_p.shape[0] // bs, True, True,
                            "pallas", True, st, idx_p, None)
    assert seen["two"] is True and seen["bs"] % 2 == 0


def test_ozaki_budget_knob_trims_groups(monkeypatch):
    """CVMATRIX_TPU_OZAKI_BUDGET_LOG2 routing: a looser trim budget drops a
    product group end-to-end (planes are built thinner) and the v3 result
    still matches the default-budget kernel inside the documented bound."""
    from cvmatrix_tpu.core import batch as B
    from cvmatrix_tpu.ops import kernels as KK

    # Explicit-arg behaviour: looser budget -> fewer groups (pinned
    # budgets so the check is independent of the shipped default).
    sp_tight = KK.ozaki_trim_groups(40, budget_log2=-36)
    sp_loose = KK.ozaki_trim_groups(40, budget_log2=-32)
    assert sp_loose == sp_tight - 1

    n, k, m = 400, 300, 5
    rng3 = np.random.default_rng(3)
    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, rng3.random((n, k)), rng3.random((n, m)), rng3.random(n))
    idx = np.arange(80).reshape(2, 40)

    from cvmatrix_tpu import policy, set_routing
    before = policy().ozaki_budget_log2
    try:
        set_routing(ozaki_budget_log2=-36)
        src_full = B.prepare_ozaki_sources(cfg, st, idx)
        set_routing(ozaki_budget_log2=-32)
        src_trim = B.prepare_ozaki_sources(cfg, st, idx)
    finally:
        set_routing(ozaki_budget_log2=before)
    assert src_trim.saN.shape[0] == src_full.saN.shape[0] - 1

    out_trim = B.ozaki_v3_from_sources(cfg, src_trim, return_XTY=True,
                                       interpret=True)
    out_full = B.ozaki_v3_from_sources(cfg, src_full, return_XTY=True,
                                       interpret=True)
    v1 = np.asarray(out_trim[:, 0] + out_trim[:, 1], np.float64)[:, :k, :k + m]
    v2 = np.asarray(out_full[:, 0] + out_full[:, 1], np.float64)[:, :k, :k + m]
    scale = np.max(np.abs(v2))
    # trim delta bound 2^-32 of the column-scale product; interpret-mode
    # f32-faithfulness slack dominates (see tpu-env notes in tests README)
    assert np.max(np.abs(v1 - v2)) / scale < 1e-5


def test_f32x2_knob_routes_two_per_step(monkeypatch):
    """CVMATRIX_TPU_F32X2 routing wiring: the sweep's f32 LOOCV branch
    passes two_per_step=True and an even chunk size when the knob is on."""
    import jax.numpy as jnp

    from cvmatrix_tpu.core import batch as B

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float32)
    st = fit(cfg, X_ALL.astype(np.float32), Y_ALL.astype(np.float32),
             WEIGHTS.astype(np.float32))
    n_folds = 9  # odd: the driver must bump the chunk to even
    idx = jnp.asarray(np.arange(n_folds)[:, None])

    seen = {}

    def spy(config, src, rows, scal_slice=None, *, return_XTY,
            two_per_step=False, interpret=False):
        seen["two"] = two_per_step
        seen["bs"] = int(rows.shape[0])
        f = rows.shape[0]
        return jnp.zeros((f, src.kp, src.cp), jnp.float32)

    monkeypatch.setattr(B, "_f32x2_enabled", lambda: True)
    monkeypatch.setattr(B, "loocv_f32_from_sources", spy)
    from cvmatrix_tpu.models.sweep import _materialize_sweep_impl, _pad_folds
    bs = 10  # what the driver computes after the even bump of 9
    idx_p, _ = _pad_folds(idx, None, bs)
    _materialize_sweep_impl(cfg, bs, idx_p.shape[0] // bs, True, True,
                            "pallas", True, st, idx_p, None)
    assert seen["two"] is True and seen["bs"] % 2 == 0


def test_reduce_sweep_cache_survives_fresh_lambdas():
    """A fresh-but-identical reduce_fn lambda per call must not recompile
    the sweep program (static args hash via HashableFn's code key)."""
    from cvmatrix_tpu.models import sweep as S

    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    idx = np.arange(24).reshape(4, 6)

    def call(scale):
        return cross_validate_reduce(
            cfg, st, idx,
            reduce_fn=lambda mats, stats: mats[0].trace() * scale,
            batch_size=2)

    # Isolate from other tests' entries: jit caches hold weakly-referenced
    # static args, so a GC between measurements can shrink the count and
    # make an exact-delta assertion flaky in the full suite (observed once
    # in the 340-test run). GC stays OFF for the whole measurement window.
    import gc

    # Pin the MECHANISM first (jax-internals-free): the static-arg key for
    # fresh-but-identical lambdas must compare/hash equal, and a different
    # closure value must produce a different key.
    def make(scale):
        return S._HashableFn(lambda mats, stats: mats[0].trace() * scale)

    k1, k2, k3 = make(1.0), make(1.0), make(2.0)
    assert k1 == k2 and hash(k1) == hash(k2)
    assert k1 != k3

    S._reduce_sweep_jit.clear_cache()
    gc.collect()
    gc.disable()
    try:
        a = call(1.0)
        n0 = S._reduce_sweep_jit._cache_size()
        b = call(1.0)  # fresh lambda, same code + closure -> cache hit
        nb = S._reduce_sweep_jit._cache_size()
        assert_allclose(np.asarray(a), np.asarray(b))
        c = call(2.0)  # different closure value -> different program
        nc = S._reduce_sweep_jit._cache_size()
        assert_allclose(np.asarray(c), 2.0 * np.asarray(a))
        # pjit's _cache_size() reports -1 once the function has caches
        # under more than one jax config state (other tests call the
        # module-level jit under different contexts in the full suite) —
        # the counter assertions only mean something when it counts.
        if min(n0, nb, nc) >= 0:
            assert nb == n0, "identical lambda recompiled the sweep"
            assert nc == n0 + 1, "different closure aliased a program"
    finally:
        gc.enable()


@pytest.mark.parametrize("use_w", [False, True])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_loocv_reduce_loop_wiring(use_w, dtype):
    """Single-chip LOOCV reduce fast path (hoisted sources + all-in-one
    kernel), driven directly in interpret mode on CPU: operand WIRING only
    (loose tolerance; exact kernel math is chip-verified), arbitrary fold
    order, vs the per-fold eager engine. The sweep entry gates this path on
    a TPU backend, so it cannot be reached through cross_validate_reduce
    here."""
    import jax.numpy as jnp

    from cvmatrix_tpu.models.sweep import _loocv_reduce_loop

    cfg = CVConfig(True, True, True, True, 1, dtype=dtype)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS if use_w else None)
    ref = CVMatrix(dtype=dtype).fit(X_ALL[:, :5], Y_ALL,
                                    WEIGHTS if use_w else None)
    n = X_ALL.shape[0]
    rng = np.random.default_rng(3)
    order = rng.permutation(n)[:24]  # arbitrary order, not arange
    idx_c = np.asarray(order, np.int32).reshape(4, 6, 1)

    def reduce_fn(mats, stats):
        xtx, xty = mats
        return {"tr": jnp.trace(xtx), "y0": xty[:, 0], "mX": stats[0]}

    out = _loocv_reduce_loop(cfg, st, jnp.asarray(idx_c), reduce_fn,
                             return_XTY=True, interpret=True)
    assert out["tr"].shape == (4, 6)
    tol = dict(rtol=1e-3, atol=1e-1)
    for c in range(4):
        for i in range(6):
            v = np.asarray([idx_c[c, i, 0]])
            (rx, ry), rstats = ref.training_XTX_XTY(v)
            assert_allclose(float(out["tr"][c, i]), float(np.trace(rx)),
                            **tol)
            assert_allclose(np.asarray(out["y0"][c, i]),
                            np.asarray(ry)[:, 0], **tol)
            assert_allclose(np.asarray(out["mX"][c, i]),
                            np.asarray(rstats[0]), **tol)


@pytest.mark.parametrize("use_w", [False, True])
@pytest.mark.parametrize("dtype", [np.float64, np.float32])
def test_smallfold_reduce_loop_wiring(use_w, dtype):
    """Single-chip small-fold reduce fast path (hoisted prepare_fold_operands
    + packed downdate kernel), driven directly in interpret mode on CPU:
    operand WIRING only (loose tolerance; exact kernel math is
    chip-verified) vs the per-fold eager engine. The sweep entry gates this
    path on a TPU backend, so it cannot be reached through
    cross_validate_reduce here."""
    import jax.numpy as jnp

    from cvmatrix_tpu.models.sweep import _smallfold_reduce_loop

    cfg = CVConfig(True, True, True, True, 1, dtype=dtype)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS if use_w else None)
    ref = CVMatrix(dtype=dtype).fit(X_ALL[:, :5], Y_ALL,
                                    WEIGHTS if use_w else None)
    rng = np.random.default_rng(5)
    idx = np.stack([rng.permutation(X_ALL.shape[0])[:6] for _ in range(12)])
    idx_c = jnp.asarray(idx.reshape(3, 4, 6))

    def reduce_fn(mats, stats):
        xtx, xty = mats
        return {"tr": jnp.trace(xtx), "y0": xty[:, 0], "sX": stats[1]}

    out = _smallfold_reduce_loop(cfg, st, idx_c, None, reduce_fn,
                                 True, True, interpret=True)
    assert out["tr"].shape == (3, 4)
    tol = dict(rtol=1e-3, atol=1e-1)
    for c in range(3):
        for i in range(4):
            v = idx[c * 4 + i]
            (rx, ry), rstats = ref.training_XTX_XTY(v)
            assert_allclose(float(out["tr"][c, i]), float(np.trace(rx)),
                            **tol)
            assert_allclose(np.asarray(out["y0"][c, i]),
                            np.asarray(ry)[:, 0], **tol)
            assert_allclose(np.asarray(out["sX"][c, i]),
                            np.asarray(rstats[1]), **tol)


def test_v3_reduce_loop_wiring():
    """Mid-band hoisted v3 reduce fast path (dataset slice planes + fused
    Ozaki kernel + hoisted stats), interpret mode on CPU: operand WIRING
    at loose tolerance vs the per-fold eager engine."""
    import jax.numpy as jnp

    from cvmatrix_tpu.core.batch import large_fold_threshold, ozaki_v3_ok
    from cvmatrix_tpu.models.sweep import _v3_reduce_loop

    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    L = large_fold_threshold(cfg, st, True, True)
    assert ozaki_v3_ok(cfg, st, True, True, L)
    ref = CVMatrix().fit(X_ALL[:, :5], Y_ALL, WEIGHTS)
    rng = np.random.default_rng(6)
    idx = np.stack([rng.permutation(X_ALL.shape[0])[:L] for _ in range(8)])
    idx_c = jnp.asarray(idx.reshape(2, 4, L))

    def reduce_fn(mats, stats):
        xtx, xty = mats
        return {"tr": jnp.trace(xtx), "y0": xty[:, 0], "mX": stats[0]}

    out = _v3_reduce_loop(cfg, st, idx_c, None, reduce_fn, True,
                          interpret=True)
    tol = dict(rtol=1e-3, atol=1e-1)
    for c in range(2):
        for i in range(4):
            (rx, ry), rstats = ref.training_XTX_XTY(idx[c * 4 + i])
            assert_allclose(float(out["tr"][c, i]), float(np.trace(rx)),
                            **tol)
            assert_allclose(np.asarray(out["y0"][c, i]),
                            np.asarray(ry)[:, 0], **tol)
            assert_allclose(np.asarray(out["mX"][c, i]),
                            np.asarray(rstats[0]), **tol)


def test_v3_reduce_loop_masked_wiring():
    """Masked fold batches through the single-chip hoisted v3 reduce loop:
    masked rows must contribute exactly nothing (vs eager with the same
    mask)."""
    import jax.numpy as jnp

    from cvmatrix_tpu.core.batch import large_fold_threshold
    from cvmatrix_tpu.core.fold import training_matrices
    from cvmatrix_tpu.models.sweep import _v3_reduce_loop

    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    L = large_fold_threshold(cfg, st, True, True)
    rng = np.random.default_rng(8)
    idx = np.stack([rng.permutation(X_ALL.shape[0])[:L] for _ in range(4)])
    mk = (rng.random((4, L)) > 0.3).astype(np.float64)
    mk[:, 0] = 1.0
    idx_c = jnp.asarray(idx.reshape(2, 2, L))
    mk_c = jnp.asarray(mk.reshape(2, 2, L))

    def reduce_fn(mats, stats):
        return jnp.trace(mats[0]) + jnp.sum(mats[1])

    out = _v3_reduce_loop(cfg, st, idx_c, mk_c, reduce_fn, True,
                          interpret=True)
    for c in range(2):
        for i in range(2):
            f = c * 2 + i
            (rx, ry), _ = training_matrices(
                cfg, st, idx[f], mk[f], return_XTX=True, return_XTY=True)
            want = float(np.trace(np.asarray(rx)) + np.sum(np.asarray(ry)))
            assert_allclose(float(out[c, i]), want, rtol=1e-3, atol=1e-1)
