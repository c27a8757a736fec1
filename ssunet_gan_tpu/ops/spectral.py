"""Spectral normalization as carried functional state.

Replaces the reference's vendored forward-pre-hook implementation
(/root/reference/scripts/spectral_norm.py, and ``torch.nn.utils.spectral_norm``
applied to SPADEResnetBlock convs at archs.py:55-56).  Torch needs in-place
u/v buffer mutation plus DataParallel replication discipline
(spectral_norm.py:38-88); in JAX the power-iteration vectors are just
variables in a ``spectral`` collection, threaded through the jitted train
step like any other state — no hooks, no replication hacks.

Parity: 1 power iteration per training forward, eps 1e-12, u/v initialized
from a normalized Gaussian, sigma = uᵀ W v with gradients flowing through W
only (u, v are stop-gradiented), eval mode reuses stored u/v without
iterating — all matching torch defaults.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d, _bias_init_for_fan, torch_kernel_init

EPS = 1e-12


def _l2_normalize(v: jax.Array, eps: float = EPS) -> jax.Array:
    return v / (jnp.linalg.norm(v) + eps)


def _normal_init(key, shape):
    return _l2_normalize(jax.random.normal(key, shape, jnp.float32))


class SNConv2d(nn.Module):
    """Conv2d with spectral weight normalization (power iteration state in
    the ``spectral`` collection)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    power_iterations: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        st = (self.stride,) * 2 if isinstance(self.stride, int) else tuple(self.stride)
        pd = (self.padding,) * 2 if isinstance(self.padding, int) else tuple(self.padding)
        in_ch = x.shape[-1]
        kernel_shape = (*ks, in_ch, self.features)
        kernel = self.param("kernel", torch_kernel_init, kernel_shape, jnp.float32)

        # (O, N) matrix view; column permutation vs torch's (O, I·kh·kw) view
        # leaves singular values unchanged.
        n = int(np.prod(kernel_shape[:-1]))
        mat = kernel.reshape(n, self.features).T

        # init fns run only while initializing (the collection is supplied
        # on apply), so make_rng("params") is always available inside them
        u_var = self.variable(
            "spectral", "u", lambda: _normal_init(self.make_rng("params"), (self.features,))
        )
        v_var = self.variable(
            "spectral", "v", lambda: _normal_init(self.make_rng("params"), (n,))
        )

        u, v = u_var.value, v_var.value
        if train and not self.is_initializing():
            m = jax.lax.stop_gradient(mat)
            for _ in range(self.power_iterations):
                v = _l2_normalize(m.T @ u)
                u = _l2_normalize(m @ v)
            u_var.value = u
            v_var.value = v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)

        sigma = u @ (mat @ v)
        kernel_sn = (kernel / sigma).astype(x.dtype)

        y = jax.lax.conv_general_dilated(
            x,
            kernel_sn,
            window_strides=st,
            padding=((pd[0], pd[0]), (pd[1], pd[1])),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = int(np.prod(kernel_shape[:-1]))
            bias = self.param("bias", _bias_init_for_fan(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y.astype(x.dtype)
