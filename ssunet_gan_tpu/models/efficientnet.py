"""EfficientNet encoder family (flax, NHWC).

Re-implements the reference's vendored EfficientNet-PyTorch v0.5.1
(/root/reference/scripts/efficientnet_pytorch/model.py, utils.py):

- block-string spec + decoder (utils.py:180-252), b0–l2 scaling table
  (utils.py:162-177), ``round_filters``/``round_repeats`` (utils.py:60-80);
- MBConv: expand 1×1 → depthwise k×k → SE → project 1×1, swish activations,
  id-skip with drop-connect scaled by block index (model.py:18-99, 202-216);
- TF "same" padding: the reference picks static padding from the image size
  (utils.py:95-146); under jit all shapes are static, so the same asymmetric
  pad is computed at trace time — one code path instead of two classes;
- BN momentum 1−0.99=0.01, eps 1e-3 (global params);
- ``extract_features`` endpoint used by :class:`AttentiveCNN` (archs.py:442).

Torch checkpoints convert through :mod:`ssunet_gan_tpu.compat` (module names
match after the ``_blocks.N.`` → ``_blocks_N.`` rename).
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import torch_kernel_init, _bias_init_for_fan
from ssunet_gan_tpu.ops.norm import BatchNorm
from ssunet_gan_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    kernel_size: int
    num_repeat: int
    input_filters: int
    output_filters: int
    expand_ratio: int
    id_skip: bool
    se_ratio: Optional[float]
    stride: int


# the official b0 architecture (utils.py:258-263)
BLOCK_STRINGS = [
    "r1_k3_s11_e1_i32_o16_se0.25",
    "r2_k3_s22_e6_i16_o24_se0.25",
    "r2_k5_s22_e6_i24_o40_se0.25",
    "r3_k3_s22_e6_i40_o80_se0.25",
    "r3_k5_s11_e6_i80_o112_se0.25",
    "r4_k5_s22_e6_i112_o192_se0.25",
    "r1_k3_s11_e6_i192_o320_se0.25",
]

# width, depth, resolution, dropout (utils.py:162-177)
SCALING_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}

BN_MOMENTUM = 0.01  # torch momentum = 1 − 0.99 (utils.py GlobalParams)
BN_EPS = 1e-3


def decode_block_string(s: str) -> BlockArgs:
    """Parse one block string (utils.py:184-206)."""
    options = {}
    for op in s.split("_"):
        splits = re.split(r"(\d.*)", op)
        if len(splits) >= 2:
            options[splits[0]] = splits[1]
    return BlockArgs(
        kernel_size=int(options["k"]),
        num_repeat=int(options["r"]),
        input_filters=int(options["i"]),
        output_filters=int(options["o"]),
        expand_ratio=int(options["e"]),
        id_skip="noskip" not in s,
        se_ratio=float(options["se"]) if "se" in options else None,
        stride=int(options["s"][0]),
    )


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """Width scaling with 8-divisor snapping (utils.py:60-72)."""
    if not width:
        return filters
    filters *= width
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: float) -> int:
    """Depth scaling (utils.py:75-80)."""
    if not depth:
        return repeats
    return int(math.ceil(depth * repeats))


def scaled_block_args(model_name: str) -> Tuple[List[BlockArgs], float, int]:
    """Expanded per-block args for a model variant; returns
    (blocks, dropout, head_channels)."""
    width, depth, _, dropout = SCALING_PARAMS[model_name]
    blocks: List[BlockArgs] = []
    for s in BLOCK_STRINGS:
        a = decode_block_string(s)
        a = dataclasses.replace(
            a,
            input_filters=round_filters(a.input_filters, width),
            output_filters=round_filters(a.output_filters, width),
            num_repeat=round_repeats(a.num_repeat, depth),
        )
        blocks.append(a)
    return blocks, dropout, round_filters(1280, width)


def _same_pad(size: int, k: int, s: int, d: int = 1) -> Tuple[int, int]:
    """TF 'same' asymmetric padding for one spatial axis (utils.py:110-121)."""
    out = math.ceil(size / s)
    pad = max((out - 1) * s + (k - 1) * d + 1 - size, 0)
    return pad // 2, pad - pad // 2


class SamePadConv(nn.Module):
    """Conv2d with TF-style same padding, computed at trace time from the
    (static-under-jit) input shape — replaces both the reference's static and
    dynamic padding classes (utils.py:95-146)."""

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        in_ch = x.shape[-1]
        kernel_shape = (k, k, in_ch // self.groups, self.features)
        kernel = self.param("kernel", torch_kernel_init, kernel_shape, jnp.float32)
        pad_h = _same_pad(x.shape[1], k, s)
        pad_w = _same_pad(x.shape[2], k, s)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (s, s), (pad_h, pad_w),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            fan_in = int(np.prod(kernel_shape[:-1]))
            bias = self.param("bias", _bias_init_for_fan(fan_in), (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def swish(x: jax.Array) -> jax.Array:
    """x·sigmoid(x) (MemoryEfficientSwish — the custom autograd is just an
    activation here; JAX differentiates it directly, utils.py:37-53)."""
    return x * jax.nn.sigmoid(x)


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck (model.py:18-99)."""

    args: BlockArgs

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 drop_connect_rate: Optional[float] = None) -> jax.Array:
        a = self.args
        inputs = x
        oup = a.input_filters * a.expand_ratio
        if a.expand_ratio != 1:
            x = SamePadConv(oup, 1, use_bias=False, name="_expand_conv")(x)
            x = BatchNorm(oup, eps=BN_EPS, momentum=BN_MOMENTUM, name="_bn0")(x, train)
            x = swish(x)
        x = SamePadConv(oup, a.kernel_size, a.stride, groups=oup, use_bias=False,
                        name="_depthwise_conv")(x)
        x = BatchNorm(oup, eps=BN_EPS, momentum=BN_MOMENTUM, name="_bn1")(x, train)
        x = swish(x)

        if a.se_ratio is not None and 0 < a.se_ratio <= 1:
            squeezed = max(1, int(a.input_filters * a.se_ratio))
            se = jnp.mean(x, axis=(1, 2), keepdims=True)
            se = SamePadConv(squeezed, 1, name="_se_reduce")(se)
            se = SamePadConv(oup, 1, name="_se_expand")(swish(se))
            x = jax.nn.sigmoid(se) * x

        x = SamePadConv(a.output_filters, 1, use_bias=False, name="_project_conv")(x)
        x = BatchNorm(a.output_filters, eps=BN_EPS, momentum=BN_MOMENTUM, name="_bn2")(x, train)

        if a.id_skip and a.stride == 1 and a.input_filters == a.output_filters:
            if drop_connect_rate and train and self.has_rng("dropout"):
                # torch drop_connect (utils.py:83-92): per-sample binary keep
                keep = 1.0 - drop_connect_rate
                rnd = keep + jax.random.uniform(
                    self.make_rng("dropout"), (x.shape[0], 1, 1, 1), x.dtype
                )
                x = x / keep * jnp.floor(rnd)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet b0–l2 (model.py:132-247).

    ``features_only=True`` ⇒ ``extract_features`` behaviour (the encoder
    endpoint AttentiveCNN uses); otherwise the classifier head runs.
    """

    model_name: str = "efficientnet-b0"
    num_classes: int = 1000
    features_only: bool = False
    drop_connect_rate: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        width, _, _, dropout_rate = SCALING_PARAMS[self.model_name]
        blocks, _, head_ch = scaled_block_args(self.model_name)

        stem = round_filters(32, width)
        x = SamePadConv(stem, 3, 2, use_bias=False, name="_conv_stem")(x)
        x = BatchNorm(stem, eps=BN_EPS, momentum=BN_MOMENTUM, name="_bn0")(x, train)
        x = swish(x)

        # expand repeats exactly like model.py:185-195
        flat: List[BlockArgs] = []
        for a in blocks:
            flat.append(a)
            rest = dataclasses.replace(a, input_filters=a.output_filters, stride=1)
            flat.extend([rest] * (a.num_repeat - 1))
        n = len(flat)
        for idx, a in enumerate(flat):
            rate = self.drop_connect_rate * idx / n if self.drop_connect_rate else None
            x = MBConvBlock(a, name=f"_blocks_{idx}")(x, train, rate)

        x = SamePadConv(head_ch, 1, use_bias=False, name="_conv_head")(x)
        x = BatchNorm(head_ch, eps=BN_EPS, momentum=BN_MOMENTUM, name="_bn1")(x, train)
        x = swish(x)
        if self.features_only:
            return x

        x = jnp.mean(x, axis=(1, 2))
        if train and self.has_rng("dropout"):
            x = nn.Dropout(rate=dropout_rate, deterministic=False, name="_dropout")(x)
        from ssunet_gan_tpu.ops.conv import Dense

        return Dense(self.num_classes, name="_fc")(x)


# AttentiveCNN feature widths per variant (archs.py:430-437)
F_CHANNELS = {
    "efficientnet-b2": 1408,
    "efficientnet-b3": 1536,
    "efficientnet-b4": 1792,
    "efficientnet-b5": 2048,
}


class AttentiveCNN(nn.Module):
    """Latent encoder → 1024-ch feature map (archs.py:409-466).

    ``eff_flag=True`` (default): images are bilinearly resized to the
    EfficientNet variant's native resolution (archs.py:459,
    ``F.interpolate`` align_corners=False), features extracted, then
    projected through a bias-free 1×1 ``conv_a``.

    ``eff_flag=False``: the ResNet-101 backend (archs.py:443-449) — resize
    to 224, run the torchvision-style conv trunk (:class:`ResNet101Trunk`),
    project 2048→1024.  Two reference bugs fixed here and documented: its
    resnet branch never defines ``conv_a`` yet ``forward`` calls it
    unconditionally (archs.py:442/465 — AttributeError as shipped), and
    ``self.f_channel`` stays at the eff default 1408 while ResNet-101
    produces 2048 channels.  We define conv_a as 2048→``eff_channel`` per
    the evident intent so the downstream 1024-ch decoder contract holds.
    """

    eff_model_name: str = "efficientnet-b2"
    eff_channel: int = 1024
    eff_flag: bool = True

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = True) -> jax.Array:
        if not self.eff_flag:
            from ssunet_gan_tpu.models.resnet import ResNet101Trunk
            from ssunet_gan_tpu.ops.conv import Conv2d

            x = resize_bilinear(images, 224, 224, align_corners=False)
            x = ResNet101Trunk(name="resnet_conv")(x, train)
            return Conv2d(self.eff_channel, 1, use_bias=False, name="conv_a")(x)

        size = SCALING_PARAMS[self.eff_model_name][2]
        x = resize_bilinear(images, size, size, align_corners=False)
        x = EfficientNet(self.eff_model_name, features_only=True, name="eff_conv")(x, train)
        f = F_CHANNELS.get(self.eff_model_name, 1408)
        assert x.shape[-1] == f, (x.shape, f)
        return SamePadConv(self.eff_channel, 1, use_bias=False, name="conv_a")(x)
