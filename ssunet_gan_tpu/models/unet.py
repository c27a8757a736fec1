"""U-Net family without SPADE conditioning (NHWC, flax.linen).

Behaviour-parity re-implementations of:
- ``UNet``        ← /root/reference/scripts/archs.py:791-829
- ``UNet_ori``    ← archs.py:935-996 (up_conv decoder)
- ``NestedUNet``  ← archs.py:863-933 (UNet++; deep supervision → list of 4)
- ``ProgUNet``    ← archs.py:745-789 (multi-scale heads, returns list of 4)
- ``AttUNet``     ← archs.py:271-342 (attention-gated skips)

Skip concatenation order matches torch ``cat([skip, up], dim=1)`` with the
channel axis moved last.
"""

from __future__ import annotations

from typing import List, Union

import jax
from flax import linen as nn

from ssunet_gan_tpu.ops.blocks import (
    maybe_remat,
    AttentionBlock,
    ConvBlockBNReLU,
    UpConv,
    VGGBlock,
)
from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.pool import max_pool_2x2
from ssunet_gan_tpu.ops.resize import upsample_bilinear

NB_FILTER = (64, 128, 256, 512, 1024)  # archs.py:796, 868, 939


def _up(x: jax.Array) -> jax.Array:
    """nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)."""
    return upsample_bilinear(x, 2, align_corners=True)


class UNet(nn.Module):
    """Vanilla U-Net of VGGBlocks (archs.py:791-829)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = NB_FILTER
        x0_0 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_0")(x, train)
        x1_0 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_0")(max_pool_2x2(x0_0), train)
        x2_0 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_0")(max_pool_2x2(x1_0), train)
        x3_0 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_0")(max_pool_2x2(x2_0), train)
        x4_0 = maybe_remat(VGGBlock)(f[4], f[4], name="conv4_0")(max_pool_2x2(x3_0), train)

        x3_1 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_1")((x3_0, _up(x4_0)), train)
        x2_2 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_2")((x2_0, _up(x3_1)), train)
        x1_3 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_3")((x1_0, _up(x2_2)), train)
        x0_4 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_4")((x0_0, _up(x1_3)), train)

        return Conv2d(self.num_classes, 1, name="final")(x0_4)


class UNetOri(nn.Module):
    """U-Net with up_conv decoder (archs.py:935-996)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        f = NB_FILTER
        x1 = maybe_remat(ConvBlockBNReLU)(f[0], name="conv1")(x, train)
        x2 = maybe_remat(ConvBlockBNReLU)(f[1], name="conv2")(max_pool_2x2(x1), train)
        x3 = maybe_remat(ConvBlockBNReLU)(f[2], name="conv3")(max_pool_2x2(x2), train)
        x4 = maybe_remat(ConvBlockBNReLU)(f[3], name="conv4")(max_pool_2x2(x3), train)
        x5 = maybe_remat(ConvBlockBNReLU)(f[4], name="conv5")(max_pool_2x2(x4), train)

        d5 = UpConv(f[3], name="up5")(x5, train)
        d5 = maybe_remat(ConvBlockBNReLU)(f[3], name="up_conv5")((x4, d5), train)
        d4 = UpConv(f[2], name="up4")(d5, train)
        d4 = maybe_remat(ConvBlockBNReLU)(f[2], name="up_conv4")((x3, d4), train)
        d3 = UpConv(f[1], name="up3")(d4, train)
        d3 = maybe_remat(ConvBlockBNReLU)(f[1], name="up_conv3")((x2, d3), train)
        d2 = UpConv(f[0], name="up2")(d3, train)
        d2 = maybe_remat(ConvBlockBNReLU)(f[0], name="up_conv2")((x1, d2), train)

        return Conv2d(self.num_classes, 1, name="final")(d2)


class AttUNet(nn.Module):
    """Attention U-Net (archs.py:271-342).

    Note the reference's constructor signature is (output_ch, img_ch=3) with
    fixed filters 64..1024 (archs.py:278-282).
    """

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x1 = maybe_remat(ConvBlockBNReLU)(64, name="conv1")(x, train)
        x2 = maybe_remat(ConvBlockBNReLU)(128, name="conv2")(max_pool_2x2(x1), train)
        x3 = maybe_remat(ConvBlockBNReLU)(256, name="conv3")(max_pool_2x2(x2), train)
        x4 = maybe_remat(ConvBlockBNReLU)(512, name="conv4")(max_pool_2x2(x3), train)
        x5 = maybe_remat(ConvBlockBNReLU)(1024, name="conv5")(max_pool_2x2(x4), train)

        d5 = UpConv(512, name="up5")(x5, train)
        a4 = AttentionBlock(256, name="att5")(d5, x4, train)
        d5 = maybe_remat(ConvBlockBNReLU)(512, name="up_conv5")((a4, d5), train)

        d4 = UpConv(256, name="up4")(d5, train)
        a3 = AttentionBlock(128, name="att4")(d4, x3, train)
        d4 = maybe_remat(ConvBlockBNReLU)(256, name="up_conv4")((a3, d4), train)

        d3 = UpConv(128, name="up3")(d4, train)
        a2 = AttentionBlock(64, name="att3")(d3, x2, train)
        d3 = maybe_remat(ConvBlockBNReLU)(128, name="up_conv3")((a2, d3), train)

        d2 = UpConv(64, name="up2")(d3, train)
        a1 = AttentionBlock(32, name="att2")(d2, x1, train)
        d2 = maybe_remat(ConvBlockBNReLU)(64, name="up_conv2")((a1, d2), train)

        return Conv2d(self.num_classes, 1, name="final")(d2)


class NestedUNet(nn.Module):
    """UNet++ with dense nested skips (archs.py:863-933)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = True
    ) -> Union[jax.Array, List[jax.Array]]:
        f = NB_FILTER
        x0_0 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_0")(x, train)
        x1_0 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_0")(max_pool_2x2(x0_0), train)
        x0_1 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_1")((x0_0, _up(x1_0)), train)

        x2_0 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_0")(max_pool_2x2(x1_0), train)
        x1_1 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_1")((x1_0, _up(x2_0)), train)
        x0_2 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_2")((x0_0, x0_1, _up(x1_1)), train)

        x3_0 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_0")(max_pool_2x2(x2_0), train)
        x2_1 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_1")((x2_0, _up(x3_0)), train)
        x1_2 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_2")((x1_0, x1_1, _up(x2_1)), train)
        x0_3 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_3")(
            (x0_0, x0_1, x0_2, _up(x1_2)), train
        )

        x4_0 = maybe_remat(VGGBlock)(f[4], f[4], name="conv4_0")(max_pool_2x2(x3_0), train)
        x3_1 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_1")((x3_0, _up(x4_0)), train)
        x2_2 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_2")((x2_0, x2_1, _up(x3_1)), train)
        x1_3 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_3")(
            (x1_0, x1_1, x1_2, _up(x2_2)), train
        )
        x0_4 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_4")(
            (x0_0, x0_1, x0_2, x0_3, _up(x1_3)), train
        )

        if self.deep_supervision:
            return [
                Conv2d(self.num_classes, 1, name="final1")(x0_1),
                Conv2d(self.num_classes, 1, name="final2")(x0_2),
                Conv2d(self.num_classes, 1, name="final3")(x0_3),
                Conv2d(self.num_classes, 1, name="final4")(x0_4),
            ]
        return Conv2d(self.num_classes, 1, name="final")(x0_4)


class ProgUNet(nn.Module):
    """U-Net with multi-scale heads returning 4 outputs (archs.py:745-789)."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> List[jax.Array]:
        f = NB_FILTER
        x0_0 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_0")(x, train)
        x1_0 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_0")(max_pool_2x2(x0_0), train)
        x2_0 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_0")(max_pool_2x2(x1_0), train)
        x3_0 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_0")(max_pool_2x2(x2_0), train)
        x4_0 = maybe_remat(VGGBlock)(f[4], f[4], name="conv4_0")(max_pool_2x2(x3_0), train)

        x3_1 = maybe_remat(VGGBlock)(f[3], f[3], name="conv3_1")((x3_0, _up(x4_0)), train)
        x2_2 = maybe_remat(VGGBlock)(f[2], f[2], name="conv2_2")((x2_0, _up(x3_1)), train)
        x1_3 = maybe_remat(VGGBlock)(f[1], f[1], name="conv1_3")((x1_0, _up(x2_2)), train)
        x0_4 = maybe_remat(VGGBlock)(f[0], f[0], name="conv0_4")((x0_0, _up(x1_3)), train)

        return [
            Conv2d(self.num_classes, 1, name="final0")(x0_4),
            Conv2d(self.num_classes, 1, name="final1")(x1_3),
            Conv2d(self.num_classes, 1, name="final2")(x2_2),
            Conv2d(self.num_classes, 1, name="final3")(x3_1),
        ]
