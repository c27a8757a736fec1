"""EfficientNet-encoder segmentation model — the reference's latent path
made runnable.

The reference's trainer has an ``'effnet' in arch`` branch that splits an
``encoder`` submodule (AttentiveCNN) onto a second Adam optimizer
(train.py:274-301, 118-120), but no arch in its registry actually wires
AttentiveCNN (SURVEY.md §2) — the path is dead code as shipped, and the
``cnn_optimizer.step()`` runs with already-zeroed gradients (train.py:114-120,
SURVEY.md §7 known bugs).  This model completes the capability: an
``encoder`` attribute holding :class:`AttentiveCNN` (so the dual-optimizer
param split applies) feeding a light upsampling decoder.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from ssunet_gan_tpu.models.efficientnet import AttentiveCNN
from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.norm import BatchNorm
from ssunet_gan_tpu.ops.resize import resize_bilinear, upsample_bilinear


class EffNetUNet(nn.Module):
    """AttentiveCNN encoder (1024-ch latent map) + conv-upsample decoder."""

    num_classes: int
    input_channels: int = 3
    deep_supervision: bool = False
    eff_model_name: str = "efficientnet-b2"
    eff_flag: bool = True  # False → ResNet-101 backend (archs.py:443-449)

    def setup(self):
        self.encoder = AttentiveCNN(self.eff_model_name, eff_flag=self.eff_flag)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        feat = self.encoder(x, train)  # (B, ~9, ~9, 1024) at native res /32
        y = feat
        for i, ch in enumerate((512, 256, 128, 64)):
            y = upsample_bilinear(y, 2, align_corners=False)
            y = Conv2d(ch, 3, padding=1, use_bias=False, name=f"dec_conv{i}")(y)
            y = BatchNorm(ch, name=f"dec_bn{i}")(y, train)
            y = nn.relu(y)
        y = Conv2d(self.num_classes, 1, name="final")(y)
        return resize_bilinear(y, h, w, align_corners=False)
