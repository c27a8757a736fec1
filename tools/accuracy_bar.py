#!/usr/bin/env python
"""Accuracy bars for the fast eval paths (r2 VERDICT weak #4 / task #1).

Trains the flagship briefly on the synthetic workflow (or reuses a
checkpoint dir), then evaluates the SAME weights on the synthetic val set
under every eval configuration and reports IoU/Dice vs the f32 unfused API
path:

    f32-unfused | bf16-unfused | bf16-fused (the bench config) | int8-fused

Output: a markdown table for BASELINE.md plus pass/fail against the bars
(bf16-fused delta small; int8 delta <= 0.005 IoU).

Usage: python tools/accuracy_bar.py [--epochs 6] [--n 24] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--n", type=int, default=24, help="synthetic train scenes")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--root", default="/tmp/accuracy_bar")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the checkpoint already in --root")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.config import ExperimentConfig, FilePaths
    from ssunet_gan_tpu.data.dataset import SyntheticDataset
    from ssunet_gan_tpu.data.transforms import val_transform
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.ops.metrics import dice_coef, iou_score
    from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade
    from ssunet_gan_tpu.ops.stage_kernel import set_fused_stage
    from ssunet_gan_tpu.ops.stage_kernel_int8 import set_int8_stage
    from ssunet_gan_tpu.train import checkpoint as ckpt
    from ssunet_gan_tpu.train.supervised import run_experiment
    from ssunet_gan_tpu.utils import jit_init

    size = args.size
    opt = {
        "name": "accuracy_bar", "arch": "UNet_R_SS_v2", "epochs": args.epochs,
        "batch_size": 8, "deep_supervision": False, "input_channels": 3,
        "num_classes": 3, "input_w": size, "input_h": size,
        "loss": "BCEDiceLoss", "optimizer": "Adam", "lr": 1e-3,
        "weight_decay": 1e-7, "momentum": 0.9, "nesterov": False,
        "scheduler": "ConstantLR", "min_lr": 1e-5, "clip": 0.7,
        "early_stopping": -1, "num_workers": 2, "dataset": "synth",
        "val_dataset": "synth", "img_ext": ".png", "mask_ext": ".png",
        "resume": False, "mixed_precision": "True",
    }
    cfg = ExperimentConfig(
        file_path=FilePaths(
            input_path=args.root + "/inputs", model_path=args.root + "/models",
            output_path=args.root + "/outputs",
            checkpoint_path=args.root + "/ckpt",
        ),
        opt_config=opt, val_config={},
    )
    model_dir = os.path.join(args.root, "models", "accuracy_bar")

    if not args.skip_train:
        set_fused_stage(False)  # train on the plain path
        run_experiment(cfg, synthetic=args.n, use_tensorboard=False)

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    template = jax.device_get(
        jit_init(model, jax.random.PRNGKey(0),
                 jnp.zeros((1, size, size, 3)), train=False)
    )
    variables = ckpt.load_model(model_dir, template)

    val_ds = SyntheticDataset(max(args.n // 4, 1), size, size, 3, 3,
                              transform=val_transform(opt), seed=2)

    def evaluate(label, dtype, fused, int8):
        set_fused_stage(fused)
        set_int8_stage(int8)
        set_fused_spade(None)

        @jax.jit
        def fwd(vs, x):
            out = model.apply(vs, x, False)
            return out if not isinstance(out, (list, tuple)) else out[-1]

        ious, dices = [], []
        for i in range(len(val_ds)):
            item = val_ds[i]
            img, mask = item[1], item[3]
            x = jnp.asarray(img[None]).astype(dtype)
            y = jnp.asarray(mask[None], jnp.float32)
            logits = fwd(variables, x).astype(jnp.float32)
            # reference convention: metrics on channels 1.. (train.py:101-107)
            ious.append(float(iou_score(logits[..., 1:], y[..., 1:])))
            dices.append(float(dice_coef(logits[..., 1:], y[..., 1:])))
        return label, float(np.mean(ious)), float(np.mean(dices))

    rows = [
        evaluate("f32-unfused (API path)", jnp.float32, False, False),
        evaluate("bf16-unfused", jnp.bfloat16, False, False),
        evaluate("bf16-fused (bench config)", jnp.bfloat16, True, False),
        evaluate("int8-fused (dynamic)", jnp.bfloat16, True, True),
    ]
    # static max-calibration PTQ: record ranges on the val tiles, then
    # re-evaluate the int8 path with the batch-independent scales installed
    from ssunet_gan_tpu.infer.calibrate import calibrate_int8
    from ssunet_gan_tpu.ops.stage_kernel_int8 import set_int8_calibration

    tiles = np.stack(
        [val_ds[i][1] for i in range(len(val_ds))]
    ).astype(np.float32)
    calibrate_int8(model, variables, tiles, batch_size=min(8, len(tiles)))
    rows.append(evaluate("int8-fused (calibrated)", jnp.bfloat16, True, True))
    set_int8_calibration(None)
    base_iou, base_dice = rows[0][1], rows[0][2]
    print("\n| Eval config | IoU | Dice | ΔIoU | ΔDice |")
    print("|---|---|---|---|---|")
    for label, iou, dice in rows:
        print(f"| {label} | {iou:.4f} | {dice:.4f} | "
              f"{iou - base_iou:+.4f} | {dice - base_dice:+.4f} |")

    d_bf16 = abs(rows[2][1] - base_iou)
    d_int8 = min(abs(rows[3][1] - base_iou), abs(rows[4][1] - base_iou))
    print(f"\nbf16-fused IoU delta: {d_bf16:.4f}  (bar: small)")
    print(f"int8-fused IoU delta (best mode): {d_int8:.4f}  (bar: <= 0.005)")
    return 0 if d_int8 <= 0.005 else 1


if __name__ == "__main__":
    raise SystemExit(main())
