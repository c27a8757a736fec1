"""Batch normalization with torch-faithful semantics — and free SyncBN.

Replaces both ``nn.BatchNorm2d`` and the reference's entire vendored
synchronized-BN runtime (/root/reference/scripts/batchnorm.py:50-127,
comm.py:18-138, replicate.py:27-95 — ~600 lines of thread rendezvous and
CUDA-peer reductions).  On TPU none of that machinery is needed: under
``jit`` over a device mesh the batch axis is a *global* array axis, so the
``jnp.mean``/``jnp.var`` below are global reductions and XLA lowers them to
ICI collectives automatically.  Per-replica statistics can't even be
expressed — synchronized BN is the only behaviour.

Torch-parity details:
- normalization uses the *biased* batch variance;
- running stats update with the *unbiased* variance
  (torch _BatchNorm.forward semantics);
- ``running = (1 - momentum) · running + momentum · batch`` with torch's
  default momentum 0.1;
- eps 1e-5.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssunet_gan_tpu.ops import collectives


class BatchNorm(nn.Module):
    """Torch-semantics BatchNorm over NHWC (reduces axes 0,1,2).

    Variables:
      - params: ``scale``/``bias`` when ``affine=True``
      - batch_stats: ``mean``/``var`` running statistics

    Args mirror ``nn.BatchNorm2d(features, eps, momentum, affine)``.
    ``train=True`` uses batch statistics and updates running stats (when the
    ``batch_stats`` collection is mutable); ``train=False`` normalizes with
    running statistics.
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 batch_stats=None) -> jax.Array:
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        if x is None and batch_stats is not None:
            # stats-update path for the fused TRAIN kernel: the kernel
            # computed this step's batch (mean, unbiased var) out-of-module;
            # apply the torch running-average update (momentum 0.1)
            mean, unbiased_var = batch_stats
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased_var
            return None

        if x is None:
            if train:
                # raw param fetch for the fused TRAIN kernel (stats come
                # from the data; running stats updated via batch_stats=...)
                if self.affine:
                    return scale, bias
                return (jnp.ones((self.features,), jnp.float32),
                        jnp.zeros((self.features,), jnp.float32))
            # param-fetch path for fused eval kernels: the folded per-channel
            # eval affine (y = x·k + b), identical math to the branch below
            inv = jax.lax.rsqrt(ra_var.value + self.eps)
            k = inv
            b = -ra_mean.value * inv
            if self.affine:
                k = k * scale
                b = b * scale + bias
            return k, b

        if not train:
            # Eval fast path: running stats are constants, so normalization
            # is a per-channel affine y = x·k + b.  Folding the f32 constant
            # math into two channel vectors keeps the activation tensor in
            # its own dtype end-to-end — no f32 round-trip between convs —
            # and XLA fuses the multiply-add into the conv epilogue.
            inv = jax.lax.rsqrt(ra_var.value + self.eps)
            k = inv
            b = -ra_mean.value * inv
            if self.affine:
                k = k * scale
                b = b * scale + bias
            y = x * k.astype(x.dtype) + b.astype(x.dtype)
            return y.astype(self.dtype or x.dtype)

        compute_dtype = jnp.float32
        xf = x.astype(compute_dtype)
        reduce_axes = tuple(range(x.ndim - 1))

        # under the shard_map train path (collectives.train_axis active) the
        # batch axis is mapped, so SyncBN needs explicit cross-shard pmeans;
        # under GSPMD these are identity and jnp.mean is already global
        mean = collectives.pmean_if(jnp.mean(xf, axis=reduce_axes))
        var = collectives.pmean_if(
            jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
        )
        n = collectives.axis_size()
        for ax in reduce_axes:
            n *= x.shape[ax]
        unbiased_var = var * (n / max(n - 1, 1))
        if not self.is_initializing():
            ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
            ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased_var

        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
