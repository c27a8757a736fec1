"""Segmentation metrics — computed on device, jittable.

Behaviour-parity with /root/reference/scripts/metrics.py, but without the
per-step device→host sync the reference pays (metrics.py:10-12 forces a
``.cpu().numpy()`` every train step — SURVEY.md §3 hot-loop rank 4).  Here
the metrics are tiny scalar reductions fused into the jitted step; the host
reads them once per logging interval.

Convention preserved from the trainers (train.py:101-107): callers slice off
the background channel (channel 0) before calling these, i.e. metrics see
channels 1..C-1 only.  With channels-last layout that is ``x[..., 1:C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.ops.collectives import psum_if

SMOOTH = 1e-5


def iou_score(output_logits: jax.Array, target: jax.Array) -> jax.Array:
    """Thresholded IoU (metrics.py:6-22).

    sigmoid → >0.5 threshold with NaN→False (metrics.py:13-15), target >0.5,
    smoothed intersection/union over all elements.
    """
    probs = jax.nn.sigmoid(output_logits.astype(jnp.float32))
    out_bin = jnp.where(jnp.isnan(probs), False, probs > 0.5)
    tar_bin = target.astype(jnp.float32) > 0.5
    # psum_if: global sums under the shard_map train path (no-op otherwise)
    intersection = psum_if(jnp.sum(out_bin & tar_bin))
    union = psum_if(jnp.sum(out_bin | tar_bin))
    return (intersection + SMOOTH) / (union + SMOOTH)


def dice_coef(output_logits: jax.Array, target: jax.Array) -> jax.Array:
    """Soft dice on sigmoid probabilities, no threshold (metrics.py:25-35)."""
    probs = jax.nn.sigmoid(output_logits.astype(jnp.float32)).reshape(-1)
    target = target.astype(jnp.float32).reshape(-1)
    intersection = psum_if(jnp.sum(probs * target))
    return (2.0 * intersection + SMOOTH) / (
        psum_if(jnp.sum(probs)) + psum_if(jnp.sum(target)) + SMOOTH
    )


def foreground_slice(x: jax.Array, num_classes: int) -> jax.Array:
    """Slice channels 1..C-1 (background excluded), channels-last
    (train.py:101-102 with NCHW → here NHWC)."""
    return x[..., 1:num_classes]
