"""ResNet-101 conv trunk — the AttentiveCNN's non-efficientnet backend.

Behaviour-parity re-implementation of the encoder the reference builds at
/root/reference/scripts/archs.py:446-449: ``torchvision.models.resnet101``
with the final fc + avgpool dropped (``children()[:-2]`` wrapped in an
``nn.Sequential``), i.e. the standard torchvision v1 ResNet:

    conv7×7/2 → BN → ReLU → maxpool3×3/2 →
    layer1 (3×Bottleneck,  64→256, stride 1) →
    layer2 (4×Bottleneck, 128→512, stride 2) →
    layer3 (23×Bottleneck, 256→1024, stride 2) →
    layer4 (3×Bottleneck, 512→2048, stride 2)

with the stride on each Bottleneck's 3×3 conv and a 1×1-conv+BN downsample
on every layer's first block. Module names are chosen so the torch
checkpoint's ``resnet_conv.<seq-index>...`` keys map onto this tree through
``compat.torch_loader``'s rename rules (Sequential index 0→conv1, 1→bn1,
4..7→layer1..4, ``layerL.i``→``layerL_i``, ``downsample.0/1``→
``downsample_conv``/``downsample_bn``) — so reference checkpoints trained
with the resnet101 branch migrate.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.norm import BatchNorm

# (planes, blocks, first-block stride) per layer — torchvision resnet101
LAYER_SPECS = ((64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2))
EXPANSION = 4


class Bottleneck101(nn.Module):
    """torchvision ``Bottleneck`` (expansion 4, stride on the 3×3 conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        out_ch = self.planes * EXPANSION
        y = Conv2d(self.planes, 1, use_bias=False, name="conv1")(x)
        y = nn.relu(BatchNorm(self.planes, name="bn1")(y, train))
        y = Conv2d(self.planes, 3, stride=self.stride, padding=1, use_bias=False,
                   name="conv2")(y)
        y = nn.relu(BatchNorm(self.planes, name="bn2")(y, train))
        y = Conv2d(out_ch, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(out_ch, name="bn3")(y, train)
        if self.downsample:
            identity = Conv2d(out_ch, 1, stride=self.stride, use_bias=False,
                              name="downsample_conv")(x)
            identity = BatchNorm(out_ch, name="downsample_bn")(identity, train)
        else:
            identity = x
        return nn.relu(y + identity)


class ResNet101Trunk(nn.Module):
    """The ``children()[:-2]`` conv trunk: (B, H, W, 3) → (B, H/32, W/32, 2048)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = Conv2d(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = nn.relu(BatchNorm(64, name="bn1")(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, blocks, stride) in enumerate(LAYER_SPECS, start=1):
            for bi in range(blocks):
                x = Bottleneck101(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=bi == 0,  # every first block re-projects
                    name=f"layer{li}_{bi}",
                )(x, train)
        return x
