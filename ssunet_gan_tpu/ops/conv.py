"""Conv / Dense primitives with torch-faithful initialization.

torch ``nn.Conv2d``/``nn.Linear`` default to kaiming-uniform(a=√5) weights —
equivalently U(−1/√fan_in, +1/√fan_in) — with the same bound for the bias.
Matching the init distribution keeps training dynamics comparable with the
reference even before any weights are converted.

Layout: NHWC activations, HWIO kernels (XLA's native TPU conv layout).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssunet_gan_tpu.ops.acts import WTensor


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(−1/√fan_in, 1/√fan_in) for HWIO kernels (torch conv default)."""
    fan_in = int(np.prod(shape[:-1]))  # kh * kw * in_ch
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_dense_init(key, shape, dtype=jnp.float32):
    """U(−1/√fan_in, 1/√fan_in) for (in, out) dense kernels."""
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for_fan(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_fan_in_init(key, shape, dtype=jnp.float32):
    """torch ``init.kaiming_uniform_(w, mode='fan_in')`` (a=0, ReLU gain) for
    HWIO kernels — used by the SS-UNet final 1×1 convs (archs.py:522-524)."""
    fan_in = int(np.prod(shape[:-1]))
    gain = np.sqrt(2.0)
    bound = gain * np.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2d(nn.Module):
    """torch-``nn.Conv2d``-shaped conv on NHWC.

    ``padding`` is the symmetric int padding of torch (not 'SAME'). Supports
    stride, groups, and optional bias with torch default init.

    The input may be a **tuple of arrays** standing for their channel
    concatenation: ``conv(cat(a, b)) == conv_a(a) + conv_b(b)`` with the one
    kernel sliced along its input-channel axis.  On TPU this is ~25% faster
    at the U-Net decoder shapes than materializing the concat (XLA inserts
    full-tensor layout copies around the concatenate) and leaves the
    parameter tree — and therefore checkpoints/torch conversion — unchanged.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[object] = None
    bias_fill: Optional[float] = None
    in_channels: Optional[int] = None  # only needed for the x=None path

    @nn.compact
    def __call__(self, x) -> jax.Array:
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.stride,) * 2 if isinstance(self.stride, int) else tuple(self.stride)
        pd = (self.padding,) * 2 if isinstance(self.padding, int) else tuple(self.padding)
        if x is None:
            # param-fetch path (fused kernels need the raw weights without
            # applying the conv) — declares the IDENTICAL tree
            assert self.in_channels is not None, "x=None needs in_channels"
            parts: Tuple = ()
            in_ch = self.in_channels
        else:
            # W-minor (N, H, C, W) activations from the fused eval path
            # (ops/wminor.py): 1×1/stride-1 convs — the SS-UNet per-level
            # heads — run natively in that orientation (a C-axis einsum, no
            # relayout) and KEEP it; any other geometry converts here.
            wminor_in = isinstance(x, WTensor)
            if wminor_in and not (
                ks == (1, 1) and st == (1, 1) and pd == (0, 0)
                and self.groups == 1
            ):
                x, wminor_in = jnp.swapaxes(x.v, 2, 3), False
            parts = (
                (x,)
                if isinstance(x, WTensor)
                else tuple(x) if isinstance(x, (tuple, list)) else (x,)
            )
            in_ch = sum(p.shape[-1] for p in parts)
        if len(parts) > 1 and self.groups != 1:
            raise ValueError("tuple (split-concat) input requires groups=1")
        kernel_shape = (*ks, in_ch // self.groups, self.features)
        kernel = self.param(
            "kernel", self.kernel_init or torch_kernel_init, kernel_shape, jnp.float32
        )

        if x is None:
            if not self.use_bias:
                return kernel, None
            fan_in = int(np.prod(kernel_shape[:-1]))
            bias_init = (
                nn.initializers.constant(self.bias_fill)
                if self.bias_fill is not None
                else _bias_init_for_fan(fan_in)
            )
            return kernel, self.param("bias", bias_init, (self.features,), jnp.float32)

        if wminor_in:
            v = parts[0].v  # (N, H, C_in, W)
            k11 = kernel[0, 0].astype(v.dtype)  # (C_in, features)
            y = jnp.einsum(
                "if,nhiw->nhfw", k11, v,
                preferred_element_type=(
                    jnp.float32 if v.dtype == jnp.float32 else None
                ),
            )
            if self.use_bias:
                fan_in = int(np.prod(kernel_shape[:-1]))
                bias_init = (
                    nn.initializers.constant(self.bias_fill)
                    if self.bias_fill is not None
                    else _bias_init_for_fan(fan_in)
                )
                bias = self.param(
                    "bias", bias_init, (self.features,), jnp.float32
                )
                y = y + bias.astype(y.dtype)[:, None]
            return WTensor(y.astype(v.dtype))

        def one(p: jax.Array, k: jax.Array) -> jax.Array:
            return jax.lax.conv_general_dilated(
                p,
                k.astype(p.dtype),
                window_strides=st,
                padding=((pd[0], pd[0]), (pd[1], pd[1])),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.float32 if p.dtype == jnp.float32 else None,
            )

        if len(parts) == 1:
            y = one(parts[0], kernel)
        else:
            y = None
            off = 0
            for p in parts:
                c = p.shape[-1]
                yp = one(p, jax.lax.slice_in_dim(kernel, off, off + c, axis=2))
                y = yp if y is None else y + yp
                off += c
        if self.use_bias:
            fan_in = int(np.prod(kernel_shape[:-1]))
            if self.bias_fill is not None:
                bias_init = nn.initializers.constant(self.bias_fill)
            else:
                bias_init = _bias_init_for_fan(fan_in)
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.astype(parts[0].dtype)


class Dense(nn.Module):
    """torch-``nn.Linear``-shaped dense layer."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_dense_init, (in_features, self.features), jnp.float32)
        y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", _bias_init_for_fan(in_features), (self.features,), jnp.float32)
            y = y + bias
        return y.astype(x.dtype)


class PReLU(nn.Module):
    """torch ``nn.PReLU()`` — one shared slope, init 0.25."""

    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)
