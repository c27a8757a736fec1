"""GAN components (NHWC, flax.linen).

Behaviour-parity re-implementations of /root/reference/scripts/models_seg_gan.py:

- :class:`Discriminator` ← models_seg_gan.py:246-300 — SRGAN-D over
  *segmentation maps*: input channels = num_classes (models_seg_gan.py:260),
  8 alternating channel-double / stride-2 LeakyReLU conv blocks,
  AdaptiveAvgPool(6,6) → FC(1024) → logit.
- :class:`SRResNet`      ← models_seg_gan.py:134-190 (present-but-unused in
  the reference's training; kept for capability parity).
- :class:`Generator`     ← models_seg_gan.py:193-243 — wraps any registry
  arch; the warm start from a supervised checkpoint
  (``initialize_with_srresnet``, models_seg_gan.py:216-233) lives in
  ``ssunet_gan_tpu.train.checkpoint`` / ``ssunet_gan_tpu.compat``.
"""

from __future__ import annotations

import math

import jax
from flax import linen as nn

from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.blocks import SRConvBlock, SubPixelConvBlock
from ssunet_gan_tpu.ops.conv import Dense
from ssunet_gan_tpu.ops.resize import adaptive_avg_pool


class Discriminator(nn.Module):
    """SRGAN discriminator on segmentation maps (models_seg_gan.py:246-300).

    Reference quirk: its ``fc2`` is hardcoded ``Linear(1024, 1)`` regardless
    of ``fc_size`` (models_seg_gan.py:284), so the reference only runs with
    fc_size=1024; here fc2 follows ``fc_size`` (identical at the only value
    the reference supports)."""

    num_classes: int
    kernel_size: int = 3
    n_channels: int = 64
    n_blocks: int = 8
    fc_size: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        in_channels = self.num_classes
        out_channels = in_channels
        for i in range(self.n_blocks):
            out_channels = (
                (self.n_channels if i == 0 else in_channels * 2) if i % 2 == 0 else in_channels
            )
            x = SRConvBlock(
                out_channels,
                kernel_size=self.kernel_size,
                stride=1 if i % 2 == 0 else 2,
                batch_norm=i != 0,
                activation="leakyrelu",
                name=f"block{i}",
            )(x, train)
            in_channels = out_channels

        x = adaptive_avg_pool(x, 6, 6)
        b = x.shape[0]
        # flatten in NHWC order; the torch-weight converter permutes fc1
        # accordingly (torch flattens NCHW)
        x = x.reshape(b, -1)
        x = Dense(self.fc_size, name="fc1")(x)
        x = nn.leaky_relu(x, 0.2)
        return Dense(1, name="fc2")(x)


class _SRResidualBlock(nn.Module):
    """conv-BN-PReLU + conv-BN with skip (models_seg_gan.py:100-131)."""

    n_channels: int = 64
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        residual = x
        x = SRConvBlock(
            self.n_channels, self.kernel_size, batch_norm=True, activation="prelu",
            name="conv_block1",
        )(x, train)
        x = SRConvBlock(
            self.n_channels, self.kernel_size, batch_norm=True, activation=None,
            name="conv_block2",
        )(x, train)
        return x + residual


class SRResNet(nn.Module):
    """SRResNet super-resolution net (models_seg_gan.py:134-190)."""

    large_kernel_size: int = 9
    small_kernel_size: int = 3
    n_channels: int = 64
    n_blocks: int = 16
    scaling_factor: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        assert int(self.scaling_factor) in (2, 4, 8)
        x = SRConvBlock(
            self.n_channels, self.large_kernel_size, activation="prelu", name="conv_block1"
        )(x, train)
        residual = x
        for i in range(self.n_blocks):
            x = _SRResidualBlock(self.n_channels, self.small_kernel_size, name=f"res{i}")(x, train)
        x = SRConvBlock(
            self.n_channels, self.small_kernel_size, batch_norm=True, name="conv_block2"
        )(x, train)
        x = x + residual
        for i in range(int(math.log2(int(self.scaling_factor)))):
            x = SubPixelConvBlock(self.n_channels, self.small_kernel_size, 2, name=f"subpix{i}")(x)
        return SRConvBlock(3, self.large_kernel_size, activation="tanh", name="conv_block3")(x, train)


class Generator(nn.Module):
    """Wraps a registry arch as the GAN generator (models_seg_gan.py:193-243).

    Built from the generator's saved model-card config
    (train_seg_gan.py:445-448).  The submodule is named ``net`` so torch
    checkpoints with the ``net.`` prefix convert directly.
    """

    arch: str
    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    def setup(self):
        self.net = build_model(
            self.arch, self.num_classes, self.input_channels, self.deep_supervision
        )

    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        return self.net(x, train)

    @classmethod
    def from_config(cls, config: dict) -> "Generator":
        return cls(
            arch=config["arch"],
            num_classes=config["num_classes"],
            input_channels=config["input_channels"],
            deep_supervision=bool(config["deep_supervision"]),
        )
