"""Distributed layer: row-sharded fit and fold-parallel training matrices.

Single-process mesh entry points re-exported from
:mod:`cvmatrix_tpu.parallel.distributed`; multi-host helpers live in
:mod:`cvmatrix_tpu.parallel.multihost`.
"""

from .distributed import (
    fit_sharded,
    make_mesh,
    sharded_cross_validate_reduce,
    sharded_training_matrices,
)

__all__ = [
    "fit_sharded",
    "make_mesh",
    "sharded_cross_validate_reduce",
    "sharded_training_matrices",
]
