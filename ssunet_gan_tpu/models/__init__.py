"""Model zoo and string registry.

Mirrors the reference's ``archs.__dict__[name](num_classes, input_channels,
deep_supervision)`` lookup contract (train.py:252-254) with the same 8
exported names (archs.py:8) plus the non-exported ``ProgUNet``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

from ssunet_gan_tpu.models.effnet_unet import EffNetUNet
from ssunet_gan_tpu.models.ssunet import SSUNet, UNetBSS, UNetRSS, UNetRSSv2
from ssunet_gan_tpu.models.unet import AttUNet, NestedUNet, ProgUNet, UNet, UNetOri

# reference archs.py:8 __all__ order
ARCH_REGISTRY: Dict[str, Any] = {
    "UNet": UNet,
    "NestedUNet": NestedUNet,
    "SSUNet": SSUNet,
    "UNet_ori": UNetOri,
    "UNet_B_SS": UNetBSS,
    "AttUNet": AttUNet,
    "UNet_R_SS": UNetRSS,
    "UNet_R_SS_v2": UNetRSSv2,
    # not exported by the reference's __all__ but present (archs.py:745)
    "ProgUNet": ProgUNet,
    # the reference's latent AttentiveCNN/effnet path made runnable
    # (train.py:274-301 'effnet' in arch branch; archs.py:409-466)
    "effnet_unet": EffNetUNet,
    # TPU-oriented opt-in: 64-ch levels padded to 128 for full MXU lanes
    # (not reference-checkpoint-compatible; see UNetRSSv2 docstring)
    "UNet_R_SS_v2_wide": functools.partial(
        UNetRSSv2, filters=(128, 128, 256, 384, 512, 768)
    ),
}

ARCH_NAMES = list(ARCH_REGISTRY)[:8]  # the reference's exported set


def build_model(arch: str, num_classes: int, input_channels: int = 3,
                deep_supervision: bool = False):
    """``archs.__dict__[arch](C, in_ch, ds)`` equivalent (train.py:252-254)."""
    if arch not in ARCH_REGISTRY:
        raise KeyError(f"unknown arch {arch!r}; available: {list(ARCH_REGISTRY)}")
    return ARCH_REGISTRY[arch](
        num_classes=num_classes,
        input_channels=input_channels,
        deep_supervision=deep_supervision,
    )
