#!/usr/bin/env python
"""Migrate reference (PyTorch) checkpoint FILES into this framework.

The executable form of docs/MIGRATION.md: reads an on-disk ``.pth`` /
``.pth.tar`` artifact the reference stack writes, converts it through
``ssunet_gan_tpu.compat``, prints a conversion report, and (optionally)
saves an orbax checkpoint ready for the CLIs / inference API.

Reference artifact shapes handled (file:line in /root/reference/scripts):
- ``model``         — ``model.state_dict()`` of a registry arch, possibly
                      ``module.``-prefixed (train.py:459; DataParallel).
- ``generator``     — GAN generator state_dict: the arch wrapped in a
                      ``net`` submodule (models_seg_gan.py:212-233).
- ``discriminator`` — SRGAN discriminator state_dict
                      (models_seg_gan.py:251-284), incl. the NHWC fc1
                      transform for the flattened AdaptiveAvgPool input.
- ``efficientnet``  — pretrained encoder ``efficientnet-b{N}.pth``
                      (efficientnet_pytorch/utils.py:349-364).
- ``resnet101``     — torchvision resnet101 trunk for AttentiveCNN
                      (archs.py:446-449).

Usage:
    python tools/migrate.py --kind model --src model.pth --dst outdir \
        --arch UNet_R_SS_v2 --num-classes 3 [--input-channels 3]
    python tools/migrate.py --kind efficientnet --src efficientnet-b2.pth \
        --variant efficientnet-b2 [--dst outdir]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _template(model, sample_shape, train=False):
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.utils import jit_init

    return jax.device_get(
        jit_init(model, jax.random.PRNGKey(0), jnp.zeros(sample_shape), train=train)
    )


def _load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    # reference GAN trainers save dicts of components (srgan_utils.py:198-204);
    # plain trainers save bare state_dicts (train.py:459)
    if isinstance(obj, dict) and not all(hasattr(v, "shape") for v in obj.values()):
        for key in ("state_dict", "model", "generator", "discriminator"):
            if key in obj:
                obj = obj[key]
                break
    if hasattr(obj, "state_dict"):  # a whole nn.Module was saved
        obj = obj.state_dict()
    return obj


def migrate(kind: str, src: str, dst=None, arch="UNet_R_SS_v2", num_classes=3,
            input_channels=3, deep_supervision=False, variant="efficientnet-b2",
            sample=64):
    """Convert one artifact; returns (variables, report). ``dst`` saves an
    orbax checkpoint + a conversion report JSON next to it."""
    from ssunet_gan_tpu.compat import convert_torch_state_dict

    sd = _load_state_dict(src)

    if kind == "model":
        from ssunet_gan_tpu.models import build_model

        model = build_model(arch, num_classes, input_channels, deep_supervision)
        template = _template(model, (1, sample, sample, input_channels))
        variables, report = convert_torch_state_dict(sd, template)
    elif kind == "generator":
        from ssunet_gan_tpu.models.gan import Generator

        model = Generator(arch=arch, num_classes=num_classes,
                          input_channels=input_channels,
                          deep_supervision=deep_supervision)
        template = _template(model, (1, sample, sample, input_channels))
        variables, report = convert_torch_state_dict(sd, template)
    elif kind == "discriminator":
        from ssunet_gan_tpu.compat import discriminator_fc1_transform
        from ssunet_gan_tpu.models.gan import Discriminator

        model = Discriminator(num_classes=num_classes)
        template = _template(model, (1, sample, sample, num_classes))
        last_ch = template["params"]["fc1"]["kernel"].shape[0] // 36
        variables, report = convert_torch_state_dict(
            sd, template,
            special_transforms={
                "fc1.weight": discriminator_fc1_transform(last_ch)
            },
        )
    elif kind == "efficientnet":
        from ssunet_gan_tpu.models.efficientnet import EfficientNet

        model = EfficientNet(variant)
        template = _template(model, (1, sample, sample, 3))
        variables, report = convert_torch_state_dict(sd, template)
    elif kind == "resnet101":
        # resnet101 trunk state_dict → the AttentiveCNN trunk's
        # 'resnet_conv'-prefixed tree (archs.py:446-449 naming). Accepts
        # either torchvision-named keys (conv1./bn1./layerN., the pretrained
        # artifact) or the Sequential-indexed keys the reference's
        # ``nn.Sequential(*children()[:-2])`` wrapper exports.
        import re

        from ssunet_gan_tpu.models.resnet import ResNet101Trunk

        if any(k.startswith(("conv1.", "layer1.")) for k in sd):
            sd = {
                re.sub(
                    r"^layer([1-4])\.",
                    lambda m: f"{int(m.group(1)) + 3}.",
                    re.sub(r"^bn1\.", "1.", re.sub(r"^conv1\.", "0.", k)),
                ): v
                for k, v in sd.items()
            }
        # the classifier head has no trunk counterpart (children()[:-2])
        fc_keys = sorted(k for k in sd if k.startswith("fc."))
        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
        model = ResNet101Trunk()
        tmpl = _template(model, (1, sample, sample, 3))
        wrapped_sd = {f"resnet_conv.{k}": v for k, v in sd.items()}
        wrapped = {
            "params": {"resnet_conv": tmpl["params"]},
            "batch_stats": {"resnet_conv": tmpl["batch_stats"]},
        }
        conv, report = convert_torch_state_dict(wrapped_sd, wrapped)
        report["skipped"] = list(report.get("skipped", [])) + fc_keys
        variables = {
            "params": conv["params"]["resnet_conv"],
            "batch_stats": conv["batch_stats"]["resnet_conv"],
        }
    else:
        raise ValueError(f"unknown kind {kind!r}")

    n_params = sum(1 for _ in _leaves(variables))
    summary = {
        "kind": kind,
        "src": src,
        "converted_leaves": n_params,
        # 'unmatched' = torch keys that failed to land on the flax tree
        "unmatched": sorted(report.get("unmatched", [])),
        "skipped": sorted(report.get("skipped", [])),
    }
    if dst:
        from ssunet_gan_tpu.train import checkpoint as ckpt

        os.makedirs(dst, exist_ok=True)
        ckpt.save_model(dst, variables)
        with open(os.path.join(dst, "migration_report.json"), "wt") as f:
            json.dump(summary, f, indent=2)
    return variables, summary


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--kind", required=True,
                    choices=["model", "generator", "discriminator",
                             "efficientnet", "resnet101"])
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", default=None)
    ap.add_argument("--arch", default="UNet_R_SS_v2")
    ap.add_argument("--num-classes", type=int, default=3)
    ap.add_argument("--input-channels", type=int, default=3)
    ap.add_argument("--deep-supervision", action="store_true")
    ap.add_argument("--variant", default="efficientnet-b2")
    ap.add_argument("--sample", type=int, default=64,
                    help="template init spatial size (any; params are shape-"
                         "independent of H/W)")
    args = ap.parse_args(argv)

    _, summary = migrate(
        args.kind, args.src, args.dst, args.arch, args.num_classes,
        args.input_channels, args.deep_supervision, args.variant, args.sample,
    )
    print(json.dumps(summary, indent=2))
    if summary["unmatched"]:
        print("=> WARNING: unmatched torch keys remain", file=sys.stderr)
        return 1
    print("=> migration clean: all torch keys matched")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
