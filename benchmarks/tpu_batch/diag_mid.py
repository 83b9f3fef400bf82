"""Phase split of the P=1000/P=10000 band on the real chip."""
import os, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import sys; sys.path.insert(0, "/root/repo")
from cvmatrix_tpu import CVConfig, Partitioner, fit
from cvmatrix_tpu.models.sweep import materialize_sweep, materialize_cv, _v3_sweep_loop
from cvmatrix_tpu.core.batch import prepare_ozaki_sources, dataset_planes, contract_from_planes
from cvmatrix_tpu.utils import enable_persistent_cache
enable_persistent_cache()

N, K, M = 100_000, 500, 10
rng = np.random.default_rng(42)
X = rng.random((N, K)); Y = rng.random((N, M)); w = rng.random(N)
cfg = CVConfig(True, True, True, True, ddof=1, dtype=np.float64)
Xd, Yd, wd = jnp.asarray(X), jnp.asarray(Y), jnp.asarray(w)

jfit = jax.jit(lambda x, y, ww: fit(cfg, x, y, ww, validate=False))
t0 = time.perf_counter(); low = jfit.lower(Xd, Yd, wd)
print(f"fit lower (host tracing+HLO): {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter(); comp = low.compile()
print(f"fit compile (helper): {time.perf_counter()-t0:.2f}s", flush=True)
st = jfit(Xd, Yd, wd); float(st.XTX[0, 0])
t0 = time.perf_counter(); st = jfit(Xd, Yd, wd); float(st.XTX[0, 0])
print(f"fit warm: {time.perf_counter()-t0:.4f}s", flush=True)

prep_j = jax.jit(lambda s, i: prepare_ozaki_sources(cfg, s, i), static_argnums=())
for P in (1000, 10000):
    part = Partitioner(np.arange(N) % P)
    idx = jnp.asarray(np.stack(list(part.folds_dict.values())))
    # prepare phase alone
    src = prep_j(st, idx); float(src.saN[0,0,0].astype(jnp.float32))
    t0 = time.perf_counter(); src = prep_j(st, idx); float(src.saN[0,0,0].astype(jnp.float32))
    t_prep = time.perf_counter()-t0
    # v3 kernel loop alone on pre-built sources (bs equalized like the
    # sweep driver): isolates kernel time from the prepare/gather phase
    n = idx.shape[0]
    import numpy as _np
    dt8 = _np.dtype('float64')
    c = st.K + st.M
    per_fold = 2 * 8 * st.K * c
    bs0 = max(1, min(2000, int(4e9 / per_fold)))
    bs_ = min(bs0, n); nch = -(-n // bs_); bs_ = -(-n // nch)
    from cvmatrix_tpu.models.sweep import _pad_folds
    idx_p, _ = _pad_folds(idx, None, bs_)
    nch = idx_p.shape[0] // bs_
    src_p = prepare_ozaki_sources(cfg, st, idx_p)  # eager: keeps static fields
    loop_j = jax.jit(lambda s_, : _v3_sweep_loop(cfg, s_, bs_, nch, True))
    float(loop_j(src_p))
    t0 = time.perf_counter(); float(loop_j(src_p)); t_loop = time.perf_counter()-t0
    print(f"P={P}: v3 loop alone (bs={bs_} x {nch}): {t_loop:.4f}s", flush=True)
    # full sweep (prepare + v3 loop) warm
    p1 = float(materialize_sweep(cfg, st, idx))
    t0 = time.perf_counter(); p1 = float(materialize_sweep(cfg, st, idx))
    t_sweep = time.perf_counter()-t0
    # fused total
    p2 = float(materialize_cv(cfg, Xd, Yd, wd, idx))
    t0 = time.perf_counter(); p2 = float(materialize_cv(cfg, Xd, Yd, wd, idx))
    t_cv = time.perf_counter()-t0
    print(f"P={P}: prep={t_prep:.4f}s sweep={t_sweep:.4f}s fused_total={t_cv:.4f}s "
          f"(probe agree: {abs(p1-p2):.2e})", flush=True)
