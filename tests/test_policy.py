"""Routing-policy surface: one knob home, in-process A/B via set_routing."""

import numpy as np
import pytest

from cvmatrix_tpu import CVConfig, RoutingPolicy, fit, policy, set_routing
from cvmatrix_tpu.core import batch as B

from .data import make_dataset

X_ALL, Y_ALL, FOLDS, WEIGHTS = make_dataset(n=96, k=6, m=2)


@pytest.fixture(autouse=True)
def _restore_policy():
    before = policy()
    yield
    set_routing(**{f: getattr(before, f)
                   for f in RoutingPolicy.__dataclass_fields__})


def test_defaults_are_the_shipped_configuration():
    p = policy()
    assert isinstance(p, RoutingPolicy)
    # The validated defaults (flipped only on recorded hardware A/Bs).
    assert p.ozaki_budget_log2 <= -30


def test_set_routing_changes_trace_time_accessors():
    set_routing(sym_loocv=True, f32x2=True, df64x2=True, batch_syrk=True)
    assert B._sym_enabled() and B._f32x2_enabled() and B._df64x2_enabled()
    set_routing(sym_loocv=False)
    assert not B._sym_enabled()
    assert B._f32x2_enabled()  # partial update leaves other fields alone


def test_set_routing_rejects_unknown_field():
    with pytest.raises(TypeError):
        set_routing(not_a_knob=True)


def test_set_routing_clears_program_caches():
    from cvmatrix_tpu.models import sweep as S

    cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
    st = fit(cfg, X_ALL, Y_ALL, WEIGHTS)
    idx = np.arange(24).reshape(4, 6)
    float(S.materialize_sweep(cfg, st, idx))
    assert S._cv_fold_fn.cache_info().currsize >= 0  # registered lru lives
    set_routing(df64x2=True)
    # the jitted sweep program was cleared: its jit cache restarts empty
    assert S._materialize_sweep_jit._cache_size() == 0
    # and the sweep still runs (re-traces under the new policy)
    float(S.materialize_sweep(cfg, st, idx))


def test_ozaki_budget_flows_from_policy():
    from cvmatrix_tpu.ops.kernels import ozaki_trim_groups

    set_routing(ozaki_budget_log2=-36)
    base = ozaki_trim_groups(32)
    set_routing(ozaki_budget_log2=-31)
    loose = ozaki_trim_groups(32)
    assert loose < base
    assert ozaki_trim_groups(32, budget_log2=-36) == base  # explicit wins


def test_fn_cache_key_distinguishes_bound_methods():
    """Bound methods of different instances share __code__ but close over
    different state — they must NOT alias to one cached program."""
    from cvmatrix_tpu.utils.fnkey import HashableFn, fn_cache_key

    class R:
        def __init__(self, scale):
            self.scale = scale

        def red(self, mats, stats):
            return mats[0].trace() * self.scale

    a, b = R(1.0), R(2.0)
    assert fn_cache_key(a.red) != fn_cache_key(b.red)
    assert HashableFn(a.red) != HashableFn(b.red)
    # same instance: stable across fresh bound-method objects
    assert fn_cache_key(a.red) == fn_cache_key(a.red)
    assert HashableFn(a.red) == HashableFn(a.red)


_GLOBAL_SCALE = 1.0


def test_fn_cache_key_tracks_rebound_globals():
    """A fresh lambda reading a rebound module global must re-trace: the
    key includes referenced globals' values (identity keying would have
    retraced fresh function objects; code keying must not regress that)."""
    global _GLOBAL_SCALE
    from cvmatrix_tpu.utils.fnkey import fn_cache_key

    def make():
        return lambda m, s: m * _GLOBAL_SCALE

    _GLOBAL_SCALE = 1.0
    k1 = fn_cache_key(make())
    k1b = fn_cache_key(make())
    assert k1 == k1b
    _GLOBAL_SCALE = 2.0
    try:
        assert fn_cache_key(make()) != k1
    finally:
        _GLOBAL_SCALE = 1.0


def test_bound_method_reduce_fns_not_aliased_end_to_end():
    """cross_validate_reduce with bound-method reduce_fns from two
    instances returns different numbers (the round-3 review repro)."""
    import jax.numpy as jnp

    from cvmatrix_tpu.models.sweep import cross_validate_reduce

    cfg = CVConfig(True, True, True, True, 1)
    st = fit(cfg, X_ALL[:, :5], Y_ALL, WEIGHTS)
    idx = np.arange(24).reshape(4, 6)

    class R:
        def __init__(self, scale):
            self.scale = scale

        def red(self, mats, stats):
            return mats[0].trace() * self.scale

    a = cross_validate_reduce(cfg, st, idx, reduce_fn=R(1.0).red,
                              batch_size=2)
    b = cross_validate_reduce(cfg, st, idx, reduce_fn=R(2.0).red,
                              batch_size=2)
    np.testing.assert_allclose(np.asarray(b), 2.0 * np.asarray(a))
