"""Data-parallel collective hooks for the hand-rolled (shard_map) train path.

The GSPMD train step needs none of this: under ``jit`` over a mesh the batch
axis is a global array axis and every ``jnp.mean``/``jnp.sum`` is already a
global reduction (ops/norm.py docstring). The fused train kernels can't ride
GSPMD — Pallas calls have no SPMD partitioning rule — so their multi-chip
path runs under ``jax.shard_map`` instead (train/step.py ``mesh=``), where
cross-batch reductions must be explicit collectives.

This module is that switch: :func:`train_axis` is a context manager the
sharded step body enters *while tracing*, and the batch-statistics code
(ops/norm.py, ops/metrics.py, ops/stage_kernel_train.py, ops/train_bwd.py)
routes its batch reductions through :func:`psum_if`/:func:`pmean_if`, which
are no-ops when no axis is active. The axis size rides along statically so
unbiased-variance factors and global element counts stay Python numbers.

Replaces (with ~40 lines) the role of the reference's SyncBN thread
runtime for its DataParallel path (/root/reference/scripts/batchnorm.py,
comm.py) on the kernel-train path.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

import jax

_AXIS: Optional[str] = None
_SIZE: int = 1


@contextmanager
def train_axis(axis: Optional[str], size: int):
    """Activate a mapped batch axis for the duration of a trace."""
    global _AXIS, _SIZE
    prev = (_AXIS, _SIZE)
    _AXIS, _SIZE = axis, int(size)
    try:
        yield
    finally:
        _AXIS, _SIZE = prev


def current_axis() -> Optional[str]:
    return _AXIS


def axis_size() -> int:
    """Static size of the active axis (1 when inactive)."""
    return _SIZE if _AXIS is not None else 1


def psum_if(x):
    """Cross-shard sum when a train axis is active, identity otherwise."""
    return jax.lax.psum(x, _AXIS) if _AXIS is not None else x


def pmean_if(x):
    return jax.lax.pmean(x, _AXIS) if _AXIS is not None else x
