"""W-minor activation domain for the fused eval path.

The fused stage kernels (ops/stage_kernel*.py) compute in (N, H, C, W)
orientation; their XLA entries historically swapped NHWC ↔ W-minor at every
kernel boundary.  Between two fused stages the pools / index-unpools /
bilinear upsamples sat in NHWC, so XLA had to materialize transposing
relayout copies around every seam — ~22 ms/iter of the flagship's eval
profile (BASELINE.md r2/r3 device traces), the largest non-MXU cost left.

This module keeps activations in the kernels' native W-minor orientation
ACROSS those seams:

* :class:`WTensor` wraps a (N, H, C, W) activation and exposes the logical
  NHWC ``shape``/``dtype`` so the fused-stage gates (which reason about the
  logical image) work unchanged;
* :class:`WCode` wraps a W-minor window-local max-pool code (see
  ``ops/pool.py`` for the 2-bit-code design that replaces torch's flat HBM
  indices, /root/reference/scripts/archs.py:571-572,647-659);
* ``pool2x2* / unpool2x2 / upsample2x`` dispatch on the wrapper types and
  run the W-minor math directly — pure reshape/VPU ops with no transposes,
  so the only remaining layout conversions sit at the (cheap, 4×-smaller)
  boundaries to the unfused deep levels.

The quantized flow composes: a producer-quantized :class:`QTensor`
(ops/stage_kernel_int8.py) carries a ``wminor`` flag, and the pools below
pool its s8 payload in place (max-pooling commutes with symmetric
quantization).
"""

from __future__ import annotations

import functools

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ssunet_gan_tpu.ops import pool as nhwc_pool
from ssunet_gan_tpu.ops import resize as nhwc_resize
from ssunet_gan_tpu.ops.acts import (
    DownQTensor,
    DownTensor,
    UpTensor,
    WCode,
    WTensor,
    materialize_down,
    materialize_down_q,
    materialize_up,
    up_weights_exact,
)
from ssunet_gan_tpu.ops.resize import _linear_matrix
from ssunet_gan_tpu.ops.stage_kernel_int8 import QTensor

__all__ = [
    "WTensor", "WCode", "UpTensor", "DownTensor", "is_wminor", "to_nhwc",
    "to_wminor_view",
    "pool2x2", "pool2x2_with_indices", "unpool2x2", "upsample2x",
    "materialize_up", "set_lazy_upsample", "lazy_upsample_enabled",
    "materialize_down", "set_lazy_pool", "lazy_pool_enabled",
]


Activation = Union[jax.Array, WTensor, QTensor]


def is_wminor(t) -> bool:
    return isinstance(t, (WTensor, UpTensor)) or (
        isinstance(t, QTensor) and t.wminor
    )


def to_nhwc(t: Activation):
    """Any activation → its NHWC form (QTensor stays a QTensor)."""
    if isinstance(t, UpTensor):
        t = materialize_up(t)
    if isinstance(t, DownTensor):
        t = materialize_down(t)
    if isinstance(t, DownQTensor):
        t = materialize_down_q(t)
    if isinstance(t, WTensor):
        return jnp.swapaxes(t.v, 2, 3)
    if isinstance(t, QTensor) and t.wminor:
        return QTensor(jnp.swapaxes(t.q, 2, 3), t.scale, t.dtype)
    return t


def to_wminor_view(t: Activation) -> jax.Array:
    """The raw (N, H, C, W) view of an unquantized activation."""
    if isinstance(t, UpTensor):
        t = materialize_up(t)
    if isinstance(t, DownTensor):
        t = materialize_down(t)
    if isinstance(t, WTensor):
        return t.v
    assert not isinstance(t, QTensor), "quantized parts are handled per-path"
    return jnp.swapaxes(t, 2, 3)


# ---------------------------------------------------------------------------
# W-minor pooling (math of ops/pool.py on the (N, H, C, W) orientation).
#
# Implementation choice: the obvious 6D reshape (`_quads`) splits the MINOR
# W axis into (W/2, 2), which XLA can only lower as full relayout copies —
# the r3 eval device trace showed TWO level-0-sized copies per pool
# (copy.13/copy.14, ~11 ms/step of the flagship's 147 ms). The "shift"
# implementations below never split the minor axis: the H split is a free
# view (H is not minor), the TR/BR corners come from a W-shift (fusible
# slice+concat), the 2×2 max/code run at FULL width, and the even-column
# decimation is either one MXU dot with a 0/1 selection matrix
# ("shift_dot" — decimation is linear, f32 accumulation of one-hot rows is
# exact in every dtype used here) or a strided minor-dim slice
# ("shift_slice"). Both are bit-exact vs `_quads` (same max association
# order, same first-maximum tie rule).
# ---------------------------------------------------------------------------

_POOL_IMPL: str = "reshape6"  # "reshape6" | "shift_dot" | "shift_slice"


def set_pool_impl(name: str) -> None:
    """Select the W-minor pool lowering (A/B lever; all three bit-exact)."""
    assert name in ("reshape6", "shift_dot", "shift_slice"), name
    global _POOL_IMPL
    _POOL_IMPL = name


def pool_impl() -> str:
    return _POOL_IMPL


def _crop_even_w(v: jax.Array) -> jax.Array:
    _, h, _, w = v.shape
    return v[:, : h - h % 2, :, : w - w % 2]


def _quads(v: jax.Array):
    """The four 2×2-window corners of a (N, H, C, W) tensor, each
    (N, H/2, C, W/2), in torch row-major window order TL, TR, BL, BR."""
    n, h, c, w = v.shape
    v6 = v.reshape(n, h // 2, 2, c, w // 2, 2)
    return (
        v6[:, :, 0, :, :, 0],
        v6[:, :, 0, :, :, 1],
        v6[:, :, 1, :, :, 0],
        v6[:, :, 1, :, :, 1],
    )


def _quads_fullw(v: jax.Array):
    """Full-width 2×2-window corner candidates: at every EVEN column j the
    four returned tensors hold (TL, TR, BL, BR) of the window anchored at
    j; odd columns hold meaningless values that the decimation discards.
    No minor-axis split: the H split is a free view, TR/BR are a W-shift."""
    n, h, c, w = v.shape
    v5 = v.reshape(n, h // 2, 2, c, w)
    top, bot = v5[:, :, 0], v5[:, :, 1]
    tr = jnp.concatenate([top[..., 1:], top[..., -1:]], axis=-1)
    br = jnp.concatenate([bot[..., 1:], bot[..., -1:]], axis=-1)
    return top, tr, bot, br


def _dec_even_w(x: jax.Array) -> jax.Array:
    """Keep the even columns of the minor W axis: (…, W) → (…, W/2)."""
    if _POOL_IMPL == "shift_slice":
        return x[..., ::2]
    w = x.shape[-1]
    sel = np.zeros((w, w // 2), np.float32)
    sel[np.arange(0, w, 2), np.arange(w // 2)] = 1.0
    if x.dtype == jnp.int8:
        out = jax.lax.dot_general(
            x, jnp.asarray(sel, jnp.int8),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return out.astype(jnp.int8)
    out = jax.lax.dot_general(
        x, jnp.asarray(sel, x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def _pool_idx_impl(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    if _POOL_IMPL == "reshape6":
        a, b, c_, d = _quads(_crop_even_w(v))
        pooled = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c_, d))
        code = jnp.where(
            a == pooled,
            jnp.int8(0),
            jnp.where(
                b == pooled, jnp.int8(1),
                jnp.where(c_ == pooled, jnp.int8(2), jnp.int8(3)),
            ),
        )
        return pooled, code
    a, b, c_, d = _quads_fullw(_crop_even_w(v))
    pooled_f = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c_, d))
    code_f = jnp.where(
        a == pooled_f,
        jnp.int8(0),
        jnp.where(
            b == pooled_f, jnp.int8(1),
            jnp.where(c_ == pooled_f, jnp.int8(2), jnp.int8(3)),
        ),
    )
    return _dec_even_w(pooled_f), _dec_even_w(code_f)


def _unpool_impl(values: jax.Array, code: jax.Array) -> jax.Array:
    n, h2, c, w2 = values.shape
    zero = jnp.zeros_like(values)
    quads = [jnp.where(code == k, values, zero) for k in range(4)]
    # interleave W: (.., W2, 2) → W; then interleave H: (.., H2, 2, ..) → H
    row0 = jnp.stack([quads[0], quads[1]], axis=-1).reshape(n, h2, c, 2 * w2)
    row1 = jnp.stack([quads[2], quads[3]], axis=-1).reshape(n, h2, c, 2 * w2)
    return jnp.stack([row0, row1], axis=2).reshape(n, 2 * h2, c, 2 * w2)


def _pool_bwd_pad(g: jax.Array, shape) -> jax.Array:
    """Zero-pad an even-cropped pool gradient back to the input shape."""
    n, h, c, w = shape
    if g.shape[1] != h or g.shape[3] != w:
        g = jnp.pad(g, ((0, 0), (0, h - g.shape[1]), (0, 0),
                        (0, w - g.shape[3])))
    return g


# The seam ops carry custom VJPs: autodiff through the 2×2-window max
# chain / scatter emits pred-mask select fusions over 6D interleave
# layouts (the r3 train profile's multiply_bitcast / pad_add fusions plus
# their relayout copies), and `jnp.maximum`'s tie rule differs from
# torch's. The custom backward scatters the cotangent to the RECORDED
# first-maximum corner (`_unpool_impl`) — torch's MaxPool2d backward
# exactly, incl. relu-zero ties — and unpool's backward gathers the
# recorded corner, both in the same structured interleave form as the
# forwards.


@jax.custom_vjp
def _max_pool_w(v: jax.Array) -> jax.Array:
    return _pool_idx_impl(v)[0]


def _mp_fwd(v):
    pooled, code = _pool_idx_impl(v)
    return pooled, (code, v.shape)


def _mp_bwd(res, g):
    code, shape = res
    return (_pool_bwd_pad(_unpool_impl(g, code), shape),)


_max_pool_w.defvjp(_mp_fwd, _mp_bwd)


@jax.custom_vjp
def _max_pool_idx_w(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(pooled, code) with the first-maximum tie rule of ``jnp.argmax`` /
    torch (window order TL, TR, BL, BR)."""
    return _pool_idx_impl(v)


def _mpi_fwd(v):
    pooled, code = _pool_idx_impl(v)
    return (pooled, code), (code, v.shape)


def _mpi_bwd(res, cts):
    code, shape = res
    return (_pool_bwd_pad(_unpool_impl(cts[0], code), shape),)


_max_pool_idx_w.defvjp(_mpi_fwd, _mpi_bwd)


@jax.custom_vjp
def _unpool_w(values: jax.Array, code: jax.Array) -> jax.Array:
    """Inverse: scatter each value to its window corner, zeros elsewhere."""
    return _unpool_impl(values, code)


def _up_fwd(values, code):
    return _unpool_impl(values, code), code


def _up_bwd(code, g):
    a, b, c_, d = _quads(g)
    gv = jnp.where(
        code == 0, a,
        jnp.where(code == 1, b, jnp.where(code == 2, c_, d)),
    )
    return gv, None


_unpool_w.defvjp(_up_fwd, _up_bwd)


# ---------------------------------------------------------------------------
# Dispatching wrappers (the model's eval-path pool/upsample entry points).
# ---------------------------------------------------------------------------


_LAZY_POOL: Union[bool, None] = None


def set_lazy_pool(enabled) -> None:
    """Force the lazy (pool-on-read) encoder pool seams ON/OFF; None =
    auto (ON — the consuming fused stage kernels pool full-res row bands
    in VMEM, so the pooled tensor never exists in HBM and the 6D-reshape
    lowering's relayout copies disappear; see ops/acts.DownTensor)."""
    global _LAZY_POOL
    _LAZY_POOL = enabled


def lazy_pool_enabled() -> bool:
    return True if _LAZY_POOL is None else bool(_LAZY_POOL)


def _lazy_poolable(t) -> bool:
    """Emit the lazy form? bf16 W-minor (or a W-minor producer-quantized
    s8 QTensor — the calibrated int8 flow) with even dims: the fused eval
    kernels' regimes — every other consumer would just materialize."""
    if not lazy_pool_enabled():
        return False
    if isinstance(t, WTensor):
        _, h, _, w = t.v.shape
        return t.v.dtype == jnp.bfloat16 and h % 2 == 0 and w % 2 == 0
    if isinstance(t, QTensor) and t.wminor:
        _, h, _, w = t.q.shape
        return h % 2 == 0 and w % 2 == 0
    return False


def pool2x2(t: Activation, lazy=None) -> Activation:
    """``nn.MaxPool2d(2, 2)`` on any activation form, preserving the form.

    ``lazy=False`` disables the lazy (pool-on-read) emission for this call
    — TRAIN-mode call sites pass it: their consumers always materialize,
    so the lazy detour would just split the value/code computations apart
    (the r5 train regression)."""
    if isinstance(t, UpTensor):
        t = materialize_up(t)
    if isinstance(t, DownTensor):
        t = materialize_down(t)
    if isinstance(t, DownQTensor):
        t = materialize_down_q(t)
    if lazy is not False and _lazy_poolable(t):
        if isinstance(t, QTensor):
            return DownQTensor(t.q, t.scale, t.dtype)
        return DownTensor(t.v)
    if isinstance(t, WTensor):
        return WTensor(_max_pool_w(t.v))
    if isinstance(t, QTensor):
        if t.wminor:
            return QTensor(_max_pool_w(t.q), t.scale, t.dtype, wminor=True)
        return QTensor(nhwc_pool.max_pool_2x2(t.q), t.scale, t.dtype)
    return nhwc_pool.max_pool_2x2(t)


def pool2x2_with_indices(t: Activation, lazy=None):
    """``nn.MaxPool2d(2, 2, return_indices=True)`` on any activation form.

    W-minor inputs return a :class:`WCode`; NHWC inputs return the NHWC
    code of ``ops.pool.max_pool_2x2_with_indices``. ``lazy=False`` as in
    :func:`pool2x2`."""
    if isinstance(t, UpTensor):
        t = materialize_up(t)
    if isinstance(t, DownTensor):
        t = materialize_down(t)
    if isinstance(t, DownQTensor):
        t = materialize_down_q(t)
    if lazy is not False and _lazy_poolable(t):
        # lazy VALUES + eager code: the code rides the standard lowering
        # and is DCE'd when unconsumed (the flagship's level-0/1 codes are
        # never used — archs.py:593-667 unpools only the top 3 levels)
        if isinstance(t, QTensor):
            return (DownQTensor(t.q, t.scale, t.dtype),
                    WCode(_max_pool_idx_w(t.q)[1]))
        return DownTensor(t.v), WCode(_max_pool_idx_w(t.v)[1])
    if isinstance(t, WTensor):
        p, code = _max_pool_idx_w(t.v)
        return WTensor(p), WCode(code)
    if isinstance(t, QTensor):
        if t.wminor:
            p, code = _max_pool_idx_w(t.q)
            return QTensor(p, t.scale, t.dtype, wminor=True), WCode(code)
        p, code = nhwc_pool.max_pool_2x2_with_indices(t.q)
        return QTensor(p, t.scale, t.dtype), code
    return nhwc_pool.max_pool_2x2_with_indices(t)


def unpool2x2(values: Activation, code) -> Activation:
    """``nn.MaxUnpool2d(2, stride=2)``; a :class:`WCode` keeps the result
    in the W-minor domain (converting the SMALL pre-unpool tensor instead
    of the 4×-larger unpooled one)."""
    if isinstance(values, UpTensor):
        values = materialize_up(values)
    if isinstance(values, DownTensor):
        values = materialize_down(values)
    if isinstance(values, QTensor):
        values = values.dequant()  # unpool sites are bf16 in every arch
    if isinstance(code, WCode):
        v = values.v if isinstance(values, WTensor) else jnp.swapaxes(values, 2, 3)
        return WTensor(_unpool_w(v, code.c))
    if isinstance(values, WTensor):
        values = jnp.swapaxes(values.v, 2, 3)
    return nhwc_pool.max_unpool_2x2(values, code)


_UPSAMPLE_IMPL: str = "einsum_hw"  # "einsum_hw" | "shift_lerp"


def set_upsample_impl(name: str) -> None:
    """Select the W-minor 2× bilinear H-interp lowering (A/B lever).

    ``einsum_hw`` contracts the MAJOR H axis of the (N, H, C, W) activation,
    which XLA wraps in transposed relayout copies (~15.9 ms/step of the
    flagship's two decoder seams, BASELINE.md r3 study vs a ~4.5 ms
    materialization floor). ``shift_lerp`` rewrites the H-interp as two
    static H-shifted interleaves + a 2-term weighted add: no gather (the r3
    row-gather attempt lost 12%), no dot, no minor-axis manipulation —
    pure fusible VPU work. Each output row has exactly two nonzero matrix
    entries, and the shifted interleaves reproduce those two source rows
    with the identical weights (asserted at trace time against
    ``_linear_matrix``) — bit-exact vs the einsum in bf16 (exact bf16
    products in f32); ≤1 ulp in f32, where XLA may contract the lerp into
    an FMA that skips the einsum's per-product rounding.
    """
    assert name in ("einsum_hw", "shift_lerp"), name
    global _UPSAMPLE_IMPL
    _UPSAMPLE_IMPL = name


def upsample_impl() -> str:
    return _UPSAMPLE_IMPL


_LAZY_UPSAMPLE: Union[bool, None] = None


def set_lazy_upsample(enabled) -> None:
    """Lazy 2× bilinear upsample (``UpTensor``): defer the H-interp to the
    consuming fused stage kernel's upsample-on-read path — the full-res
    tensor never exists in HBM (ops/stage_kernel.py). Only W-minor bf16
    eval seams take the lazy form; every other consumer materializes.

    ``None`` = auto (ON — measured 224.4 → 242.6 tiles/s on the flagship
    b=32 @512² bf16-fused bench, r4; bit-exact vs the materializing
    einsum path, pinned in tests/test_stage_kernel.py)."""
    global _LAZY_UPSAMPLE
    _LAZY_UPSAMPLE = enabled


def lazy_upsample_enabled() -> bool:
    return True if _LAZY_UPSAMPLE is None else bool(_LAZY_UPSAMPLE)


def _shift_lerp_weights(rm: np.ndarray, h: int):
    """Decompose the 2×-upsample row matrix into (w0, w1) over the shifted
    interleaves a[p] = v[clip((p-1)//2)] and b[p] = v[min((p-1)//2+1, h-1)].

    Returns None when ``rm`` is not reproduced exactly (non-2× scales or an
    unexpected stencil) — caller falls back to the einsum."""
    p = rm.shape[0]
    if p != 2 * h:
        return None
    rows = np.arange(p)
    j0 = np.clip((rows - 1) // 2, 0, h - 1)
    j1 = np.minimum(j0 + 1, h - 1)
    w0 = rm[rows, j0]
    w1 = np.where(j1 > j0, rm[rows, j1], 0.0)
    # exactness guard: rebuild the matrix from the decomposition
    rebuilt = np.zeros_like(rm)
    rebuilt[rows, j0] += w0
    rebuilt[rows, j1] += w1
    if not np.array_equal(rebuilt, rm):
        return None
    return w0, w1


# Backward of the H-interp einsum. The hypothesis (r5): autodiff's
# einsum transpose is another H-MAJOR-axis contraction wrapped in
# relayout copies, while the transpose is really a 2x DOWN-combination
# (half row j receives from full rows 2j-1..2j+2 only) expressible as
# four per-row-weighted strided MAJOR-axis views - no contraction.
# MEASURED NEGATIVE on the flagship train step (b=8 bf16 @512^2, device
# traces): decomp 122.6 ms/step vs einsum-transpose 113.6 - the strided
# even/odd H-views lower as unfused slice+elementwise passes (~+9 ms),
# and a fusion-friendlier formulation canonicalized to the IDENTICAL
# HLO. Default stays the einsum transpose; the decomp ships as a tested
# opt-in (SSUNET_GAN_TPU_UP_BWD=decomp / set_up_bwd_decomp) with exact
# gradient parity pinned in tests/test_wminor.py.
import os as _os

_UP_BWD_DECOMP = _os.environ.get("SSUNET_GAN_TPU_UP_BWD", "einsum") == "decomp"


def set_up_bwd_decomp(enabled: bool) -> None:
    global _UP_BWD_DECOMP
    _UP_BWD_DECOMP = bool(enabled)


def _h_interp_einsum_fwd_only(hi_prec, rmj, v):
    if hi_prec:  # the f32 path's einsum ran at Precision.HIGHEST
        return jnp.einsum("ph,nhcw->npcw", rmj, v,
                          precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ph,nhcw->npcw", rmj, v,
                      preferred_element_type=jnp.float32)


def _bwd_wvecs(rm_np: np.ndarray):
    """Static per-half-row source weights of the transpose: half row j
    receives from full rows 2j-1, 2j, 2j+1, 2j+2 (everything else in
    rm's column j is zero). ``rm_np`` arrives already quantized to the
    forward's operand dtype. Returned as nested tuples (hashable
    nondiff args for the custom_vjp)."""
    h = rm_np.shape[1]
    j = np.arange(h)
    w_m1 = np.where(j >= 1, rm_np[np.clip(2 * j - 1, 0, 2 * h - 1), j], 0.0)
    w_0 = rm_np[2 * j, j]
    w_p1 = rm_np[2 * j + 1, j]
    w_p2 = np.where(2 * j + 2 < 2 * h,
                    rm_np[np.clip(2 * j + 2, 0, 2 * h - 1), j], 0.0)
    return tuple(
        tuple(float(x) for x in v) for v in (w_m1, w_0, w_p1, w_p2)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _h_interp_einsum(hi_prec, wvecs, rmj, v):
    # H-axis 2x interp contraction with a copy-free backward (module note
    # above). rmj: (2H, H) row matrix in the operand dtype; v: (N, H, C, W);
    # wvecs: static _bwd_wvecs of the SAME quantized matrix.
    # Returns f32 (N, 2H, C, W).
    return _h_interp_einsum_fwd_only(hi_prec, rmj, v)


def _h_interp_einsum_vjp_fwd(hi_prec, wvecs, rmj, v):
    return _h_interp_einsum_fwd_only(hi_prec, rmj, v), (rmj,)


def _h_interp_einsum_vjp_bwd(hi_prec, wvecs, res, g):
    (rmj,) = res
    vdtype = rmj.dtype  # both call sites pass v in the row matrix's dtype
    h = g.shape[1] // 2
    w_m1, w_0, w_p1, w_p2 = (np.asarray(wv_, np.float32) for wv_ in wvecs)

    # stay in g's dtype until the weighted f32 accumulation — a full-
    # tensor f32 pre-cast would materialize 2x the traffic before the
    # slices and block fusion
    g_even = g[:, 0::2]   # full rows 2k   - strided MAJOR-axis view
    g_odd = g[:, 1::2]    # full rows 2k+1
    zero = jnp.zeros_like(g_odd[:, :1])
    g_odd_m1 = jnp.concatenate([zero, g_odd[:, :-1]], axis=1)   # row 2j-1
    g_even_p1 = jnp.concatenate([g_even[:, 1:], zero], axis=1)  # row 2j+2

    def wv(x):
        return jnp.asarray(x, jnp.float32).reshape(1, h, 1, 1)

    gv = (g_odd_m1.astype(jnp.float32) * wv(w_m1)
          + g_even.astype(jnp.float32) * wv(w_0)
          + g_odd.astype(jnp.float32) * wv(w_p1)
          + g_even_p1.astype(jnp.float32) * wv(w_p2))
    return jnp.zeros_like(rmj), gv.astype(vdtype)


_h_interp_einsum.defvjp(_h_interp_einsum_vjp_fwd, _h_interp_einsum_vjp_bwd)


def _h_interp(rmj, v, rm_np: np.ndarray, hi_prec: bool = False):
    # H-interp contraction; the copy-free custom backward is the default
    # (set_up_bwd_decomp restores autodiff's einsum transpose for A/B).
    # ``rm_np``: the STATIC numpy matrix rmj was built from, quantized to
    # the operand dtype.
    if _UP_BWD_DECOMP:
        return _h_interp_einsum(hi_prec, _bwd_wvecs(rm_np), rmj, v)
    return _h_interp_einsum_fwd_only(hi_prec, rmj, v)


def _h_interp_shift_lerp(v: jax.Array, w0: np.ndarray, w1: np.ndarray,
                         wdtype) -> jax.Array:
    """out[p] = w0[p]·v[(p-1)//2] + w1[p]·v[(p-1)//2+1] (clamped), built
    from H-shifts + (H, 2)-interleaves — all major-axis views — and an
    elementwise lerp. f32 accumulation like the einsum path."""
    n, h, c, w = v.shape
    vu = jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)   # v[k-1] clamped
    vd = jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)   # v[k+1] clamped
    a = jnp.stack([vu, v], axis=2).reshape(n, 2 * h, c, w)  # v[(p-1)//2]
    b = jnp.stack([v, vd], axis=2).reshape(n, 2 * h, c, w)  # v[(p-1)//2+1]
    # quantize weights to the einsum's operand dtype, accumulate in f32
    w0j = jnp.asarray(w0, wdtype).astype(jnp.float32).reshape(1, 2 * h, 1, 1)
    w1j = jnp.asarray(w1, wdtype).astype(jnp.float32).reshape(1, 2 * h, 1, 1)
    return a.astype(jnp.float32) * w0j + b.astype(jnp.float32) * w1j


def upsample2x(t: Activation, align_corners: bool = True) -> Activation:
    """torch ``nn.Upsample(scale_factor=2, mode='bilinear')`` preserving the
    activation form (W-minor stays W-minor — H-interp via the selected
    lowering, W-interp as a minor-axis einsum)."""
    if isinstance(t, QTensor):
        t = t.dequant()
    if not isinstance(t, WTensor):
        return nhwc_resize.upsample_bilinear(t, 2, align_corners=align_corners)
    v = t.v
    _, h, _, w = v.shape
    if (
        lazy_upsample_enabled()
        and align_corners
        and v.dtype == jnp.bfloat16
        and up_weights_exact(h)
    ):
        # lazy form: W-interp now (minor-axis einsum on the HALF-H tensor),
        # H-interp deferred to the consuming kernel (upsample-on-read)
        cmj = jnp.asarray(_linear_matrix(w, 2 * w, align_corners),
                          dtype=jnp.bfloat16)
        x = jnp.einsum("qw,nhcw->nhcq", cmj, v,
                       preferred_element_type=jnp.float32)
        return UpTensor(x.astype(v.dtype))
    rm = np.asarray(_linear_matrix(h, 2 * h, align_corners))
    cm = np.asarray(_linear_matrix(w, 2 * w, align_corners))
    lerp = (
        _shift_lerp_weights(rm, h) if _UPSAMPLE_IMPL == "shift_lerp" else None
    )
    if v.dtype == jnp.bfloat16:
        cmj = jnp.asarray(cm, dtype=jnp.bfloat16)
        if lerp is not None:
            x = _h_interp_shift_lerp(v, *lerp, jnp.bfloat16)
        else:
            rmj = jnp.asarray(rm, dtype=jnp.bfloat16)
            import ml_dtypes

            rm_q = np.asarray(rm).astype(ml_dtypes.bfloat16).astype(np.float32)
            x = _h_interp(rmj, v, rm_q)
        x = jnp.einsum("qw,npcw->npcq", cmj, x, preferred_element_type=jnp.float32)
        return WTensor(x.astype(v.dtype))
    prec = jax.lax.Precision.HIGHEST
    x = v.astype(jnp.float32)
    if lerp is not None:
        x = _h_interp_shift_lerp(x, *lerp, jnp.float32)
    else:
        x = _h_interp(jnp.asarray(rm), x, np.asarray(rm), hi_prec=True)
    x = jnp.einsum("qw,npcw->npcq", jnp.asarray(cm), x, precision=prec)
    return WTensor(x.astype(v.dtype))
