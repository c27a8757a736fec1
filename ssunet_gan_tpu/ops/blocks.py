"""Building blocks for the model zoo (NHWC, flax.linen).

Behaviour-parity re-implementations of the reference's block library:

- :class:`VGGBlock`            ← archs.py:94-112
- :class:`ConvBlockBNReLU`     ← conv_block, archs.py:831-846
- :class:`UpConv`              ← up_conv (nearest ×2 + conv+BN+ReLU), archs.py:848-860
- :class:`AttentionBlock`      ← Attention_block, archs.py:115-142
- :class:`SELayer`             ← archs.py:18-33
- :class:`BasicBlock`          ← ResNet basic block, archs.py:205-241
- :class:`Bottleneck`          ← archs.py:244-269 (expansion 1)
- :class:`SubPixelConvBlock`   ← archs.py:145-175 / models_seg_gan.py:67-97
- :class:`SRConvBlock`         ← SRGAN ConvolutionalBlock, models_seg_gan.py:13-64
- :class:`Modulecell` / :class:`xResidualBlock` / :class:`xBasicBlock`
                               ← xresidualblock.py:5-33, archs.py:178-202
- :class:`SPADEResnetBlock`    ← archs.py:35-90

Every module takes ``train: bool`` to select BatchNorm batch-vs-running
statistics (torch ``.train()``/``.eval()``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d, Dense, PReLU
from ssunet_gan_tpu.ops.norm import BatchNorm
from ssunet_gan_tpu.ops.pool import global_avg_pool
from ssunet_gan_tpu.ops.resize import pixel_shuffle, upsample_nearest
from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.spectral import SNConv2d

# Optional per-block rematerialization: the flagship's f32 backward at the
# reference config (batch 6 @ 512²) needs ~20 GB HBM — over a single v5e's
# 16 GB.  Wrapping each conv block in jax.checkpoint bounds live activations
# to one block (same param tree, so checkpoints are unaffected).  Toggled by
# the trainers via the 'remat' config key.
_REMAT = False


def set_remat(enabled: bool) -> None:
    global _REMAT
    _REMAT = bool(enabled)


def maybe_remat(block_cls):
    """Wrap a block class in nn.remat when remat mode is on (train arg static)."""
    if _REMAT:
        return nn.remat(block_cls, static_argnums=(2,))
    return block_cls


class VGGBlock(nn.Module):
    """conv3-BN-ReLU ×2 with separate middle/out widths (archs.py:94-112).

    ``__call__(None, ...)`` with ``in_channels`` set is the param-fetch path
    used by the fused eval-stage kernel (a VGG stage is the BasicBlock stage
    with a zero shortcut): returns ``(k1, (s1, t1'), k2, (s2, t2'), None)``
    with the conv biases folded into the BN eval affines
    (``t' = s·b + t``).
    """

    middle_channels: int
    out_channels: int
    in_channels: int = 0  # only needed for the x=None param-fetch path

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv1 = Conv2d(self.middle_channels, 3, padding=1,
                       in_channels=self.in_channels or None, name="conv1")
        bn1 = BatchNorm(self.middle_channels, name="bn1")
        conv2 = Conv2d(self.out_channels, 3, padding=1,
                       in_channels=self.middle_channels, name="conv2")
        bn2 = BatchNorm(self.out_channels, name="bn2")

        if x is None:
            assert self.in_channels > 0, "x=None needs in_channels"
            k1, b1 = conv1(None)
            s1, t1 = bn1(None, train)
            k2, b2 = conv2(None)
            s2, t2 = bn2(None, train)
            return k1, (s1, s1 * b1 + t1), k2, (s2, s2 * b2 + t2), None

        x = conv1(x)
        x = bn1(x, train)
        x = nn.relu(x)
        x = conv2(x)
        x = bn2(x, train)
        return nn.relu(x)


class ConvBlockBNReLU(nn.Module):
    """conv_block: conv3-BN-ReLU ×2, equal widths (archs.py:831-846)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = Conv2d(self.out_channels, 3, padding=1, name="conv1")(x)
        x = BatchNorm(self.out_channels, name="bn1")(x, train)
        x = nn.relu(x)
        x = Conv2d(self.out_channels, 3, padding=1, name="conv2")(x)
        x = BatchNorm(self.out_channels, name="bn2")(x, train)
        return nn.relu(x)


class UpConv(nn.Module):
    """up_conv: nearest ×2 upsample → conv3-BN-ReLU (archs.py:848-860)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = upsample_nearest(x, 2)
        x = Conv2d(self.out_channels, 3, padding=1, name="conv")(x)
        x = BatchNorm(self.out_channels, name="bn")(x, train)
        return nn.relu(x)


class AttentionBlock(nn.Module):
    """Attention U-Net gating block (archs.py:115-142)."""

    f_int: int

    @nn.compact
    def __call__(self, g: jax.Array, x: jax.Array, train: bool = True) -> jax.Array:
        g1 = Conv2d(self.f_int, 1, name="wg_conv")(g)
        g1 = BatchNorm(self.f_int, name="wg_bn")(g1, train)
        x1 = Conv2d(self.f_int, 1, name="wx_conv")(x)
        x1 = BatchNorm(self.f_int, name="wx_bn")(x1, train)
        psi = nn.relu(g1 + x1)
        psi = Conv2d(1, 1, name="psi_conv")(psi)
        psi = BatchNorm(1, name="psi_bn")(psi, train)
        psi = jax.nn.sigmoid(psi)
        return x * psi


class SELayer(nn.Module):
    """Squeeze-and-excitation (archs.py:18-33)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = global_avg_pool(x, keepdims=False)  # (B, C)
        y = nn.relu(Dense(self.channel // self.reduction, use_bias=False, name="fc1")(y))
        y = jax.nn.sigmoid(Dense(self.channel, use_bias=False, name="fc2")(y))
        return x * y[:, None, None, :]


class BasicBlock(nn.Module):
    """ResNet basic block, expansion 1 (archs.py:205-241).

    ``__call__(None, ...)`` with ``in_planes`` set is the param-fetch path
    used by the fused eval-stage kernel: it declares the identical tree and
    returns the raw weights with the eval BatchNorms folded to affines —
    ``(k1, (s1, t1), k2, (s2, t2), ks_or_None)``.
    """

    planes: int
    stride: int = 1
    in_planes: int = 0  # only needed for the x=None param-fetch path

    @nn.compact
    def __call__(self, x, train: bool = True, stats=None):
        if x is None:
            in_planes = self.in_planes
            assert in_planes > 0, "x=None needs in_planes"
        else:
            parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
            in_planes = sum(p.shape[-1] for p in parts)

        conv1 = Conv2d(self.planes, 3, stride=self.stride, padding=1,
                       use_bias=False, in_channels=in_planes, name="conv1")
        bn1 = BatchNorm(self.planes, name="bn1")
        conv2 = Conv2d(self.planes, 3, padding=1, use_bias=False,
                       in_channels=self.planes, name="conv2")
        bn2 = BatchNorm(self.planes, name="bn2")
        has_shortcut = self.stride != 1 or in_planes != self.planes
        if has_shortcut:
            shortcut_conv = Conv2d(self.planes, 1, stride=self.stride,
                                   use_bias=False, in_channels=in_planes,
                                   name="shortcut_conv")

        if x is None and stats is not None:
            # fused-train stats-update path: write this step's batch stats
            # into the BNs' running averages (second call on the same bound
            # instance — same tree, no new params)
            bn1(None, train, batch_stats=stats[0])
            bn2(None, train, batch_stats=stats[1])
            return None

        if x is None:
            k1, _ = conv1(None)
            a1 = bn1(None, train)  # eval: folded affine; train: raw (γ, β)
            k2, _ = conv2(None)
            a2 = bn2(None, train)
            ks = shortcut_conv(None)[0] if has_shortcut else None
            return k1, a1, k2, a2, ks

        out = conv1(x)
        out = bn1(out, train)
        out = nn.relu(out)
        out = conv2(out)
        out = bn2(out, train)
        if has_shortcut:
            shortcut = shortcut_conv(x)
        else:
            shortcut = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return nn.relu(out + shortcut)


class Bottleneck(nn.Module):
    """ResNet bottleneck with expansion 1 (archs.py:244-269).

    ``__call__(None, ...)`` with ``in_planes`` set is the eval param-fetch
    path for the fused bottleneck stage kernel: returns
    ``(k1, (s1, t1), k2, (s2, t2), k3, (s3, t3), ks, (ss, ts))`` with every
    BN folded to its eval affine (``ks``/``(ss, ts)`` are None when the
    block has no projection shortcut).
    """

    planes: int
    stride: int = 1
    in_planes: int = 0  # only needed for the x=None param-fetch path

    @nn.compact
    def __call__(self, x, train: bool = True) -> jax.Array:
        if x is None:
            in_planes = self.in_planes
            assert in_planes > 0, "x=None needs in_planes"
        else:
            parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
            in_planes = sum(p.shape[-1] for p in parts)

        conv1 = Conv2d(self.planes, 1, use_bias=False,
                       in_channels=in_planes, name="conv1")
        bn1 = BatchNorm(self.planes, name="bn1")
        conv2 = Conv2d(self.planes, 3, stride=self.stride, padding=1,
                       use_bias=False, in_channels=self.planes, name="conv2")
        bn2 = BatchNorm(self.planes, name="bn2")
        conv3 = Conv2d(self.planes, 1, use_bias=False,
                       in_channels=self.planes, name="conv3")
        bn3 = BatchNorm(self.planes, name="bn3")
        has_shortcut = self.stride != 1 or in_planes != self.planes
        if has_shortcut:
            shortcut_conv = Conv2d(self.planes, 1, stride=self.stride,
                                   use_bias=False, in_channels=in_planes,
                                   name="shortcut_conv")
            shortcut_bn = BatchNorm(self.planes, name="shortcut_bn")

        if x is None:
            k1, _ = conv1(None)
            a1 = bn1(None, train)
            k2, _ = conv2(None)
            a2 = bn2(None, train)
            k3, _ = conv3(None)
            a3 = bn3(None, train)
            ks = shortcut_conv(None)[0] if has_shortcut else None
            asb = shortcut_bn(None, train) if has_shortcut else None
            return k1, a1, k2, a2, k3, a3, ks, asb

        out = conv1(x)
        out = nn.relu(bn1(out, train))
        out = conv2(out)
        out = nn.relu(bn2(out, train))
        out = conv3(out)
        out = bn3(out, train)
        if has_shortcut:
            shortcut = shortcut_bn(shortcut_conv(x), train)
        else:
            shortcut = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        return nn.relu(out + shortcut)


class SubPixelConvBlock(nn.Module):
    """conv → pixel-shuffle → PReLU (archs.py:145-175)."""

    n_channels: int = 64
    kernel_size: int = 3
    scaling_factor: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv2d(
            self.n_channels * self.scaling_factor**2,
            self.kernel_size,
            padding=self.kernel_size // 2,
            name="conv",
        )(x)
        x = pixel_shuffle(x, self.scaling_factor)
        return PReLU(name="prelu")(x)


class SRConvBlock(nn.Module):
    """SRGAN ConvolutionalBlock: conv [+BN] [+activation]
    (models_seg_gan.py:13-64)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    batch_norm: bool = False
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        act = self.activation.lower() if self.activation is not None else None
        assert act in {None, "prelu", "leakyrelu", "tanh"}
        x = Conv2d(
            self.out_channels,
            self.kernel_size,
            stride=self.stride,
            padding=self.kernel_size // 2,
            name="conv",
        )(x)
        if self.batch_norm:
            x = BatchNorm(self.out_channels, name="bn")(x, train)
        if act == "prelu":
            x = PReLU(name="prelu")(x)
        elif act == "leakyrelu":
            x = nn.leaky_relu(x, 0.2)
        elif act == "tanh":
            x = jnp.tanh(x)
        return x


def gaussian_activation(x: jax.Array) -> jax.Array:
    """exp(−x²) (xresidualblock.py:5-7)."""
    return jnp.exp(-(x * x))


class Modulecell(nn.Module):
    """Feature conv × Gaussian-activated depthwise spatial mask
    (xresidualblock.py:9-24)."""

    out_channels: int = 64
    kernel_size: int = 3
    skernel_size: int = 9

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x1 = Conv2d(
            self.out_channels,
            self.kernel_size,
            padding=(self.kernel_size - 1) // 2,
            name="features_conv",
        )(x)
        m = BatchNorm(self.out_channels, name="module_bn1")(x1, train)
        m = nn.relu(m)
        m = Conv2d(
            self.out_channels,
            self.skernel_size,
            padding=(self.skernel_size - 1) // 2,
            groups=self.out_channels,
            name="module_dwconv",
        )(m)
        m = BatchNorm(self.out_channels, name="module_bn2")(m, train)
        x2 = gaussian_activation(m)
        return x1 * x2


class xResidualBlock(nn.Module):
    """Modulecell → conv → BN, plus input residual (xresidualblock.py:26-33)."""

    planes: int = 64
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        y = Modulecell(self.planes, self.kernel_size, name="md")(x, train)
        y = Conv2d(self.planes, self.kernel_size, stride=self.stride, padding=1, name="conv2")(y)
        y = BatchNorm(self.planes, name="bn1")(y, train)
        return y + x


class xBasicBlock(nn.Module):
    """Two xResidualBlocks with an xRB shortcut (archs.py:178-202)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_planes = x.shape[-1]
        out = nn.relu(xResidualBlock(self.planes, 3, self.stride, name="conv1")(x, train))
        out = xResidualBlock(self.planes, 3, 1, name="conv2")(out, train)
        if self.stride != 1 or in_planes != self.planes:
            out = out + xResidualBlock(self.planes, 1, self.stride, name="shortcut")(x, train)
        else:
            out = out + x
        return nn.relu(out)


class SPADEResnetBlock(nn.Module):
    """SPADE ResNet block with spectral-normed convs (archs.py:35-90).

    ``semantic_nc`` is hardcoded to 2 by the reference (archs.py:41);
    ``fmiddle`` is min(fin,fout) when opt_type==1 else max (archs.py:43-46).
    """

    fin: int
    fout: int
    opt_type: int = 1
    semantic_nc: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array, train: bool = True) -> jax.Array:
        fmiddle = min(self.fin, self.fout) if self.opt_type == 1 else max(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        cfg = "spadesyncbatch3x3"

        def actvn(t):
            return nn.leaky_relu(t, 2e-1)

        if learned_shortcut:
            x_s = SPADE(cfg, self.fin, self.semantic_nc, name="norm_s")(x, seg)
            x_s = Conv2d(self.fout, 1, use_bias=False, name="conv_s")(x_s)
        else:
            x_s = x

        dx = SPADE(cfg, self.fin, self.semantic_nc, name="norm_0")(x, seg)
        dx = SNConv2d(fmiddle, 3, padding=1, name="conv_0")(actvn(dx), train)
        dx = SPADE(cfg, fmiddle, self.semantic_nc, name="norm_1")(dx, seg)
        dx = SNConv2d(self.fout, 3, padding=1, name="conv_1")(actvn(dx), train)

        return x_s + dx
