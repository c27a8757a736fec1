"""Resize / upsample ops with exact torch semantics, as MXU-friendly matmuls.

The reference decoders rely on three torch resize flavours:

- ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
  (archs.py:354, 482, 573, 687, 753, 800, 873)
- ``nn.Upsample(scale_factor=2)`` — *nearest* (archs.py:852, up_conv)
- ``nn.AdaptiveAvgPool2d((6,6))`` in the SRGAN discriminator
  (models_seg_gan.py:277)
- ``F.interpolate(..., mode='bilinear')`` (align_corners=False) in
  AttentiveCNN (archs.py:459)

``jax.image.resize`` implements half-pixel-center sampling only, which does
NOT match ``align_corners=True``.  Instead we express 2-D separable resizes
as two small dense matmuls — ``out = R_h · x · R_wᵀ`` per (batch, channel) —
which XLA tiles straight onto the MXU and fuses with neighbouring ops.  The
interpolation matrices are built with numpy at trace time (static shapes)
and become compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear-interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    for i in range(out_size):
        if align_corners:
            pos = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            pos = (i + 0.5) * in_size / out_size - 0.5
            pos = min(max(pos, 0.0), in_size - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix with torch AdaptiveAvgPool bins:
    bin i covers [floor(i·H/O), ceil((i+1)·H/O))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        m[i, start:end] = 1.0 / (end - start)
    return m


def _separable_apply(
    x: jax.Array,
    row_m: np.ndarray,
    col_m: np.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Apply (OH,H) and (OW,W) matrices over the H and W axes of NHWC ``x``.

    f32 inputs run at HIGHEST precision so the interpolation weights are not
    silently truncated on the MXU.  bf16 inputs stay bf16 end-to-end: the
    model is already operating in reduced precision there, and keeping the
    activation dtype avoids an f32 round-trip of the full tensor between
    fused conv regions (2 interpolation taps per output lose nothing
    meaningful at bf16).
    """
    orig_dtype = x.dtype
    if orig_dtype == jnp.bfloat16:
        rm = jnp.asarray(row_m, dtype=jnp.bfloat16)
        cm = jnp.asarray(col_m, dtype=jnp.bfloat16)
        x = jnp.einsum("ph,bhwc->bpwc", rm, x, preferred_element_type=jnp.float32)
        x = jnp.einsum("qw,bpwc->bpqc", cm, x, preferred_element_type=jnp.float32)
        return x.astype(orig_dtype)
    rm = jnp.asarray(row_m, dtype=jnp.float32)
    cm = jnp.asarray(col_m, dtype=jnp.float32)
    x = x.astype(jnp.float32)
    x = jnp.einsum("ph,bhwc->bpwc", rm, x, precision=precision)
    x = jnp.einsum("qw,bpwc->bpqc", cm, x, precision=precision)
    return x.astype(orig_dtype)


def upsample_bilinear(x: jax.Array, scale: int = 2, align_corners: bool = True) -> jax.Array:
    """torch ``nn.Upsample(scale_factor=s, mode='bilinear')`` on NHWC."""
    _, h, w, _ = x.shape
    return _separable_apply(
        x,
        _linear_matrix(h, h * scale, align_corners),
        _linear_matrix(w, w * scale, align_corners),
    )


def resize_bilinear(x: jax.Array, out_h: int, out_w: int, align_corners: bool = False) -> jax.Array:
    """torch ``F.interpolate(x, (out_h, out_w), mode='bilinear')`` on NHWC."""
    _, h, w, _ = x.shape
    return _separable_apply(
        x,
        _linear_matrix(h, out_h, align_corners),
        _linear_matrix(w, out_w, align_corners),
    )


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """torch ``nn.Upsample(scale_factor=s)`` default (nearest) on NHWC."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def adaptive_avg_pool(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """torch ``nn.AdaptiveAvgPool2d((out_h, out_w))`` on NHWC."""
    _, h, w, _ = x.shape
    return _separable_apply(
        x, _adaptive_avg_matrix(h, out_h), _adaptive_avg_matrix(w, out_w)
    )


def pixel_shuffle(x: jax.Array, upscale: int = 2) -> jax.Array:
    """torch ``nn.PixelShuffle`` on NHWC.

    torch shuffles NCHW channels laid out as (C_out, r, r); with NHWC the
    channel axis is last, so reshape to (..., C_out, r, r) then interleave.
    """
    b, h, w, c = x.shape
    r = upscale
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c_out
    return x.reshape(b, h * r, w * r, c_out)
