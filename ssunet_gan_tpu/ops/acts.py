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


class UpTensor(NamedTuple):
    """Half-H W-minor activation with a PENDING 2× bilinear H-interp
    (``align_corners=True``) — the lazy form of the decoder upsample seams.

    ``v`` is (N, H/2, C, W) with the W-interp already applied; ``shape``
    is the LOGICAL post-upsample NHWC shape, so the fused-stage gates and
    channel arithmetic reason about the full-res image. The consuming
    fused stage kernel reads half-res row bands and expands them in VMEM
    (stage_kernel upsample-on-read) — the full-res tensor never exists in
    HBM. Every other consumer materializes via :func:`materialize_up`.

    Every materializing lowering of this seam measured worse than the
    H-major einsum it replaces (BASELINE.md r3/r4 studies: row-gather
    −12%, dot-reorder unsafe, shift-lerp −23%); not materializing is the
    remaining route to the seam's ~4.5 ms floor."""

    v: jax.Array  # (N, H/2, C, W)

    @property
    def dtype(self):
        return self.v.dtype

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        n, hh, c, w = self.v.shape
        return (n, 2 * hh, w, c)


class DownTensor(NamedTuple):
    """Full-res W-minor activation with a PENDING 2×2 max-pool — the lazy
    form of the encoder pool seams (pool-on-read, r5).

    ``v`` is the producer's (N, 2H, C, 2W) output; ``shape`` is the
    LOGICAL post-pool NHWC shape. The consuming fused stage kernel reads
    full-res row bands (2 rows per pooled row, W-pair max + even-column
    decimation via a one-hot MXU dot in VMEM) — the pooled tensor never
    exists in HBM, which kills the two full relayout copies XLA emits for
    the 6D-reshape pool lowering (copy.13/14, ~11 ms/step at level 0 of
    the r4 eval profile; every materializing alternative measured slower —
    BASELINE.md r3 pool study). Non-kernel consumers materialize via
    :func:`materialize_down`.

    The flagship's level-0/1 pool CODES are never consumed (the decoder
    index-unpools only the top 3 levels, archs.py:593-667), so the lazy
    seam carries values only; a consumer that does want the indices goes
    through the materializing path."""

    v: jax.Array  # (N, 2H, C, 2W)

    @property
    def dtype(self):
        return self.v.dtype

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        n, h2, c, w2 = self.v.shape
        return (n, h2 // 2, w2 // 2, c)


class DownQTensor(NamedTuple):
    """Producer-quantized (s8) full-res W-minor activation with a PENDING
    2×2 max-pool — :class:`DownTensor` for the calibrated int8
    kernel-to-kernel flow (the producer emits s8 at a static scale;
    max-pooling commutes with symmetric quantization, so the pooled
    tensor's scale IS the producer's, and amax(full) = amax(pooled) —
    every full value above the pooled range would BE a window max)."""

    q: jax.Array  # (N, 2H, C, 2W) int8
    scale: float
    dtype: object  # the activation dtype the tensor logically stands in for

    @property
    def shape(self) -> Tuple[int, int, int, int]:
        n, h2, c, w2 = self.q.shape
        return (n, h2 // 2, w2 // 2, c)


def materialize_down_q(t: DownQTensor):
    """Apply the pending pool on the s8 payload (wminor QTensor out).

    Uses the WITH-indices primitive's value output so a sibling code
    computation from the same payload (pool2x2_with_indices' eager code)
    CSEs into one pool instead of two."""
    from ssunet_gan_tpu.ops import wminor
    from ssunet_gan_tpu.ops.stage_kernel_int8 import QTensor

    return QTensor(wminor._max_pool_idx_w(t.q)[0], t.scale, t.dtype,
                   wminor=True)


def materialize_down(t: DownTensor):
    """Apply the pending 2×2 max-pool (fallback for non-kernel consumers):
    returns the pooled W-minor activation via the standard lowering.
    Calls the pool primitive directly — ``pool2x2`` would re-emit the
    lazy form. Uses the WITH-indices primitive's value output so a
    sibling code computation from the same payload CSEs into one pool."""
    from ssunet_gan_tpu.ops import wminor

    return wminor.WTensor(wminor._max_pool_idx_w(t.v)[0])


def up_weights_exact(hh: int) -> bool:
    """True iff the kernel's in-band scalar-weight formula reproduces the
    f32 interpolation row matrix bit-exactly after bf16 rounding.

    The kernel computes, per output row ``p`` of the 2× H-interp
    (``align_corners=True``), the unclipped stencil ``j0 = (p-1)//2``,
    ``j1 = j0+1`` over the ZERO-EXTENDED half-res rows with

        w1 = f32(p·(hh-1) − j0·(2hh-1)) / f32(2hh-1)
        w0 = f32(j1·(2hh-1) − p·(hh-1)) / f32(2hh-1)

    — each an exact-integer numerator over one correctly-rounded f32
    division, so each weight is the correctly-rounded f32 of its true
    rational value (the naive ``pos − j0`` form double-rounds and flips
    ~2% of rows at bf16 tie boundaries for hh ≥ 128). At the edges the
    out-of-range source row is zero-masked and its weight provably lands
    on the in-range row. This guard replays the identical f32 arithmetic
    in numpy and compares against the f64-derived matrix
    (ops/resize._linear_matrix) the einsum path uses — cached per size; a
    False means the caller must keep the einsum lowering."""
    import numpy as np

    if hh < 2:
        return False
    got = _UP_EXACT_CACHE.get(hh)
    if got is not None:
        return got
    import ml_dtypes

    from ssunet_gan_tpu.ops.resize import _linear_matrix

    bf16 = ml_dtypes.bfloat16
    h2 = 2 * hh
    rm = np.asarray(_linear_matrix(hh, h2, True))  # (h2, hh) f32
    ok = True
    for p in range(h2):
        j0 = (p - 1) // 2
        j1 = j0 + 1
        w1 = np.float32(p * (hh - 1) - j0 * (h2 - 1)) / np.float32(h2 - 1)
        w0 = np.float32(j1 * (h2 - 1) - p * (hh - 1)) / np.float32(h2 - 1)
        # rebuild this row from the decomposition (zero outside [0, hh))
        row = np.zeros(hh, dtype=np.float32)
        if 0 <= j0 < hh:
            row[j0] += np.float32(bf16(w0))
        if 0 <= j1 < hh:
            row[j1] += np.float32(bf16(w1))
        want = rm[p].astype(bf16).astype(np.float32)
        if not np.array_equal(row, want):
            ok = False
            break
        if not (np.isfinite(w0) and np.isfinite(w1)):
            ok = False
            break
    _UP_EXACT_CACHE[hh] = ok
    return ok


_UP_EXACT_CACHE: dict = {}


def materialize_up(t: UpTensor) -> WTensor:
    """Apply the pending H-interp (fallback for non-kernel consumers).

    NOTE ordering: the lazy form applies W-interp first, so this is the
    W-then-H association — ≤2 ulp f32 from the default einsum_hw (H-then-W)
    path, identical after bf16 rounding except ties. Only reached when a
    lazy seam's consumer falls off the fused path (probe failure, int8
    mode, calibration record, composition fallback)."""
    import jax.numpy as jnp
    import numpy as np

    from ssunet_gan_tpu.ops.resize import _linear_matrix

    v = t.v
    _, hh, _, _ = v.shape
    rm = np.asarray(_linear_matrix(hh, 2 * hh, True))
    if v.dtype == jnp.bfloat16:
        x = jnp.einsum(
            "ph,nhcw->npcw", jnp.asarray(rm, jnp.bfloat16), v,
            preferred_element_type=jnp.float32,
        )
    else:
        x = jnp.einsum("ph,nhcw->npcw", jnp.asarray(rm), v.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
    return WTensor(x.astype(v.dtype))
