"""Truncated VGG19 perceptual network (flax, NHWC).

Behaviour-parity with /root/reference/scripts/models_seg_gan.py:303-352:
the output is the feature map of the j-th convolution (after activation)
before the i-th maxpool of VGG19 — the SRGAN "VGG loss" feature space.
Present-but-unused in the reference's training (its VGG use is commented
out, train_seg_gan.py:476); provided for capability parity.

The reference pulls pretrained weights from torchvision; this environment
has no torchvision/network, so the module initializes randomly and
:func:`load_torch_vgg19` converts a locally-provided torch state_dict.
"""

from __future__ import annotations

from typing import List

import jax
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.pool import max_pool_2x2

# VGG19 "features" plan: (torch Sequential index, out_channels) per conv,
# 'M' = maxpool — torchvision vgg19 cfg 'E'
VGG19_PLAN: List = [
    (0, 64), (2, 64), "M",
    (5, 128), (7, 128), "M",
    (10, 256), (12, 256), (14, 256), (16, 256), "M",
    (19, 512), (21, 512), (23, 512), (25, 512), "M",
    (28, 512), (30, 512), (32, 512), (34, 512), "M",
]


def truncation_point(i: int, j: int) -> int:
    """Number of plan entries to keep: through the j-th conv after the
    (i−1)-th maxpool, inclusive of its ReLU (models_seg_gan.py:320-341)."""
    maxpool_counter = 0
    conv_counter = 0
    for idx, entry in enumerate(VGG19_PLAN):
        if entry == "M":
            maxpool_counter += 1
            conv_counter = 0
        else:
            conv_counter += 1
        if maxpool_counter == i - 1 and conv_counter == j:
            return idx + 1
    raise AssertionError(
        "One or both of i=%d and j=%d are not valid choices for the VGG19!" % (i, j)
    )


class TruncatedVGG19(nn.Module):
    """VGG19 features truncated at conv (i, j) — SRGAN default (5, 4)."""

    i: int = 5
    j: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        keep = truncation_point(self.i, self.j)
        for entry in VGG19_PLAN[:keep]:
            if entry == "M":
                x = max_pool_2x2(x)
            else:
                torch_idx, ch = entry
                x = Conv2d(ch, 3, padding=1, name=f"conv{torch_idx}")(x)
                x = nn.relu(x)
        return x


def load_torch_vgg19(state_dict, variables):
    """Convert a torchvision vgg19 ``features`` (or TruncatedVGG19)
    state_dict onto this module's variables."""
    from ssunet_gan_tpu.compat import convert_torch_state_dict

    renamed = {}
    for k, v in state_dict.items():
        k = k.replace("truncated_vgg19.", "").replace("features.", "")
        parts = k.split(".")
        if parts[0].isdigit():
            k = f"conv{parts[0]}." + ".".join(parts[1:])
        renamed[k] = v
    return convert_torch_state_dict(renamed, variables)
