"""Leaf module: activation wrapper types shared across the fused eval path.

Lives below ops/stage_kernel*.py and ops/wminor.py in the import graph so
the kernels can type-dispatch on :class:`WTensor` without a cycle (wminor →
stage_kernel_int8 → stage_kernel).  See ops/wminor.py for the design story.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax


class WTensor(NamedTuple):
    """A (N, H, C, W) activation flowing between fused eval stages.

    ``shape`` is the LOGICAL NHWC shape — the fused-stage gates and the
    model dispatch reason about the logical image, not the storage
    orientation."""

    v: jax.Array  # (N, H, C, W)

    @property
    def dtype(self):
        return self.v.dtype

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        n, h, c, w = self.v.shape
        return (n, h, w, c)


class WCode(NamedTuple):
    """W-minor (N, H2, C, W2) window-local argmax code (int8, 0..3)."""

    c: jax.Array
