"""Pooling ops, including max-pool-with-indices / max-unpool.

``UNet_R_SS_v2`` — the reference config's flagship arch — pools with
``nn.MaxPool2d(2, 2, return_indices=True)`` and un-pools with
``nn.MaxUnpool2d(2, stride=2)`` (archs.py:571-572, 628-659).  XLA has no
unpool-with-indices op; the TPU-native design here avoids torch's flat
HBM-wide indices entirely:

* pooling reshapes each 2×2 window onto its own axis and takes max +
  argmax *within the window* (a 2-bit code, stored as int8);
* unpooling expands values through a one-hot of that code back into the
  window axis.

Both are pure reshape/VPU ops that XLA fuses with the surrounding convs —
no gather/scatter, no dynamic indexing.  Window-local argmax order (row
major: TL, TR, BL, BR) matches torch's flat-index order restricted to a
window, and ties resolve to the first maximum in both frameworks.

All ops are NHWC.  Odd spatial dims are floor-cropped, matching
``MaxPool2d(ceil_mode=False)``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _crop_even(x: jax.Array) -> jax.Array:
    _, h, w, _ = x.shape
    return x[:, : h - h % 2, : w - w % 2, :]


def _windowize(x: jax.Array) -> jax.Array:
    """NHWC → (B, H/2, W/2, 4, C) with the 2×2 window on its own axis."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h2, w2, wh, ww, c
    return x.reshape(b, h // 2, w // 2, 4, c)


def _dewindowize(x: jax.Array) -> jax.Array:
    """(B, H2, W2, 4, C) → NHWC with windows folded back into the plane."""
    b, h2, w2, _, c = x.shape
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h2, wh, w2, ww, c
    return x.reshape(b, h2 * 2, w2 * 2, c)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """``nn.MaxPool2d(2, 2)`` on NHWC."""
    w = _windowize(_crop_even(x))
    return jnp.max(w, axis=3)


def max_pool_2x2_with_indices(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``nn.MaxPool2d(2, 2, return_indices=True)`` — returns (pooled, code)
    where ``code`` is the int8 window-local argmax in 0..3."""
    w = _windowize(_crop_even(x))
    pooled = jnp.max(w, axis=3)
    code = jnp.argmax(w, axis=3).astype(jnp.int8)
    return pooled, code


def max_unpool_2x2(values: jax.Array, code: jax.Array) -> jax.Array:
    """``nn.MaxUnpool2d(2, stride=2)`` given window-local codes from
    :func:`max_pool_2x2_with_indices`.  Zeros everywhere except the argmax
    position of each window."""
    onehot = jax.nn.one_hot(code.astype(jnp.int32), 4, dtype=values.dtype, axis=3)
    scattered = onehot * values[:, :, :, None, :]
    return _dewindowize(scattered)


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """``nn.AdaptiveAvgPool2d(1)`` on NHWC (SELayer, archs.py:21)."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)
