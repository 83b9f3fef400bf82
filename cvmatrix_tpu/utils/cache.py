"""Persistent XLA compilation cache wiring.

The reference library needs no compile-cache story (NumPy is interpret-time;
its JAX backend's worst published cold JIT is ~23 s on GPU —
``benchmark_results_jax.csv``). On TPU the exact-f64 fit/fold programs are
large Mosaic/XLA compiles, so first-run UX depends on JAX's persistent
compilation cache: with it enabled, every compile after the first run of a
given shape/config loads from disk in milliseconds.

This is plain configuration (``jax.config`` knobs), packaged so users and
the benchmarks enable it in one line.
"""

import os

import jax

__all__ = ["enable_persistent_cache"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "cvmatrix_tpu", "xla"
)


def enable_persistent_cache(cache_dir: str = None) -> str:
    """Enable JAX's on-disk compilation cache (idempotent).

    ``cache_dir`` defaults to ``$CVMATRIX_TPU_CACHE`` or
    ``~/.cache/cvmatrix_tpu/xla``. Returns the directory used. Safe to call
    before or after backend initialisation; affects only compiles that
    happen afterwards.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("CVMATRIX_TPU_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program: the default 1s/small-entry filters would skip
    # exactly the many mid-sized fold programs a sweep compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
