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


def _make_city_dataset(input_root: str, name: str, n: int, size: int,
                       seed: int = 7, hard: bool = False) -> None:
    """Structured synthetic 'city' scenes on disk (the r1/r2 workflow's
    style): bright building rectangles (class 1) and dark road stripes
    (class 2) over ground texture, per-class mask files, standard splits.
    Visually learnable — the flagship reaches IoU ≳ 0.9 in ~10 epochs, so
    eval-path deltas are measured on a meaningful operating point.

    ``hard=True`` (r3 VERDICT weak #5: the saturated-task bars at IoU 0.994
    say little about realistic operating points) makes the task partially
    ambiguous so the model plateaus around IoU ~0.7-0.85:

    - annotation misregistration: each building's mask rect is shifted a
      few px off its rendered position and roads' mask widths jitter;
    - label noise: some buildings are unlabeled, some mask rects have no
      image evidence;
    - appearance ambiguity: some buildings are ground-colored, the ground
      carries unlabeled red-ish distractor patches, and the whole scene
      gets sensor noise + a brightness gradient."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    for split, count in (("training", n), ("validation", max(n // 4, 1)),
                         ("test", max(n // 4, 1))):
        img_dir = os.path.join(input_root, name, "images", split)
        os.makedirs(img_dir, exist_ok=True)
        mdirs = []
        for c in range(3):
            d = os.path.join(input_root, name, "annotations", split, str(c))
            os.makedirs(d, exist_ok=True)
            mdirs.append(d)
        for i in range(count):
            img = rng.integers(70, 110, (size, size, 3), np.uint8)
            m = np.zeros((size, size, 3), np.uint8)
            for _ in range(3):  # roads: dark stripes
                t = int(rng.integers(size // 32, size // 16))
                p = int(rng.integers(0, size - t))
                horiz = rng.random() < 0.5
                sl = (slice(p, p + t), slice(None)) if horiz \
                    else (slice(None), slice(p, p + t))
                img[sl] = rng.integers(25, 45)
                # hard: the labeled width jitters vs the rendered width
                mt = t + int(rng.integers(-t // 2, t // 2 + 1)) if hard else t
                mt = max(mt, 1)
                msl = (slice(p, p + mt), slice(None)) if horiz \
                    else (slice(None), slice(p, p + mt))
                m[..., 2][msl] = 255
            if hard:
                for _ in range(4):  # unlabeled red-ish ground distractors
                    dh = int(rng.integers(size // 20, size // 8))
                    dw = int(rng.integers(size // 20, size // 8))
                    y0 = int(rng.integers(0, size - dh))
                    x0 = int(rng.integers(0, size - dw))
                    img[y0:y0 + dh, x0:x0 + dw] = (
                        int(rng.integers(50, 90)), int(rng.integers(50, 90)),
                        int(rng.integers(120, 180)),
                    )
            for _ in range(10):  # buildings: bright reddish rects (on top)
                bh = int(rng.integers(size // 16, size // 5))
                bw = int(rng.integers(size // 16, size // 5))
                y0 = int(rng.integers(0, size - bh))
                x0 = int(rng.integers(0, size - bw))
                if hard and rng.random() < 0.25:  # ground-colored building
                    col = tuple(int(v) for v in rng.integers(70, 110, 3))
                else:
                    col = (int(rng.integers(40, 90)), int(rng.integers(40, 90)),
                           int(rng.integers(170, 240)))  # BGR: red-ish roofs
                img[y0 : y0 + bh, x0 : x0 + bw] = col
                if hard and rng.random() < 0.15:
                    continue  # unlabeled building
                my0, mx0 = y0, x0
                if hard:  # mask misregistration ±3 px
                    my0 = int(np.clip(y0 + rng.integers(-3, 4), 0, size - bh))
                    mx0 = int(np.clip(x0 + rng.integers(-3, 4), 0, size - bw))
                m[my0 : my0 + bh, mx0 : mx0 + bw, 1] = 255
                m[my0 : my0 + bh, mx0 : mx0 + bw, 2] = 0
            if hard and rng.random() < 0.3:  # mask rect with no evidence
                bh = int(rng.integers(size // 16, size // 6))
                bw = int(rng.integers(size // 16, size // 6))
                y0 = int(rng.integers(0, size - bh))
                x0 = int(rng.integers(0, size - bw))
                m[y0:y0 + bh, x0:x0 + bw, 1] = 255
                m[y0:y0 + bh, x0:x0 + bw, 2] = 0
            if hard:  # sensor noise + brightness gradient
                grad = np.linspace(-18, 18, size, dtype=np.float32)
                axis = rng.random() < 0.5
                g2 = grad[None, :, None] if axis else grad[:, None, None]
                noisy = (img.astype(np.float32) + g2
                         + rng.normal(0, 10, img.shape).astype(np.float32))
                img = np.clip(noisy, 0, 255).astype(np.uint8)
            m[..., 0] = 255 - np.maximum(m[..., 1], m[..., 2])  # background
            iid = f"{split}_{i:04d}"
            cv2.imwrite(os.path.join(img_dir, iid + ".png"), img)
            for c in range(3):
                cv2.imwrite(os.path.join(mdirs[c], iid + ".png"), m[..., c])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--n", type=int, default=48, help="city train scenes")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--root", default="/tmp/accuracy_bar")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the checkpoint already in --root")
    ap.add_argument("--hard", action="store_true",
                    help="non-saturated regime: label noise + appearance "
                         "ambiguity so val IoU plateaus ~0.7-0.85 and the "
                         "eval-path deltas are informative")
    ap.add_argument("--scene", action="store_true",
                    help="ALSO bar the whole-scene device path (patch -> "
                         "batched forward -> device merge -> IoU on the "
                         "merged masks) per eval config — the e2e "
                         "counterpart of the tile bars (r4 VERDICT #8)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.config import ExperimentConfig, FilePaths
    from ssunet_gan_tpu.data.dataset import SegmentationDataset, list_split_ids
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
        "loss": "BCEDiceLoss", "optimizer": "Adam", "lr": 1e-4,
        "weight_decay": 1e-7, "momentum": 0.9, "nesterov": False,
        "scheduler": "ConstantLR", "min_lr": 1e-5, "clip": 0.7,
        "early_stopping": -1, "num_workers": 2, "dataset": "city",
        "val_dataset": "city", "img_ext": ".png", "mask_ext": ".png",
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

    _make_city_dataset(args.root + "/inputs", "city", args.n, size,
                       hard=args.hard)
    if not args.skip_train:
        set_fused_stage(False)  # train on the plain path
        run_experiment(cfg, use_tensorboard=False)

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    template = jax.device_get(
        jit_init(model, jax.random.PRNGKey(0),
                 jnp.zeros((1, size, size, 3)), train=False)
    )
    variables = ckpt.load_model(model_dir, template)

    val_dir = os.path.join(args.root, "inputs", "city")
    ids = list_split_ids(args.root + "/inputs", "city", "validation", ".png")
    val_ds = SegmentationDataset(
        img_ids=ids,
        img_dir=os.path.join(val_dir, "images", "validation"),
        mask_dir=os.path.join(val_dir, "annotations", "validation"),
        img_ext=".png", mask_ext=".png", num_classes=3,
        transform=val_transform(opt),
    )

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
            item = val_ds[i]  # (ori_img, img, mask, meta)
            img, mask = item[1], item[2]
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

    rc = 0 if d_int8 <= 0.005 else 1
    if args.scene:
        rc = max(rc, _scene_bars(args, model, variables, val_ds, size))
    return rc


def _scene_bars(args, model, variables, val_ds, size) -> int:
    """Whole-scene e2e bars: assemble a (4·size)² scene from val tiles,
    run patch → batched forward → device merge per eval config, and score
    the MERGED {0,255} masks against the assembled GT (channels 1.., the
    reference's metric convention). This is the val_patch.py-shaped path
    (reference api:119-217 + val_patch.py:444-481) with the bench's
    device-side contract: uint8 tiles + device normalize, quantized-u8
    probs into the merge."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.data.tiling import grid_coords, merge_patches_device
    from ssunet_gan_tpu.infer.api import INFER_BATCH, _get_forward
    from ssunet_gan_tpu.infer.calibrate import calibrate_int8
    from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade
    from ssunet_gan_tpu.ops.stage_kernel import set_fused_stage
    from ssunet_gan_tpu.ops.stage_kernel_int8 import (
        set_int8_calibration,
        set_int8_stage,
    )

    k = 4
    n_tiles = len(val_ds)
    imgs, masks = [], []
    for i in range(k * k):
        item = val_ds[i % n_tiles]
        imgs.append(item[0])                       # ori uint8 HWC
        masks.append((item[2] > 0.5).astype(np.uint8) * 255)
    scene = np.concatenate(
        [np.concatenate(imgs[r * k:(r + 1) * k], axis=1) for r in range(k)],
        axis=0).astype(np.uint8)
    gt = np.concatenate(
        [np.concatenate(masks[r * k:(r + 1) * k], axis=1) for r in range(k)],
        axis=0)
    overlap = 0.5
    coords = grid_coords(scene.shape[0], scene.shape[1], size, overlap)
    patches = np.stack([
        scene[y:y + size, x:x + size] for y, x in coords
    ])

    def run(label, dtype, fused, int8):
        set_fused_stage(fused)
        set_int8_stage(int8)
        set_fused_spade(None)
        fwd, dev_vars = _get_forward(model, variables, None, normalize=True,
                                     dtype=dtype, quantize_probs=True)
        n = len(patches)
        pad = (-n) % INFER_BATCH
        pp = np.concatenate([patches, np.zeros_like(patches[:pad])]) \
            if pad else patches
        probs = jnp.concatenate([
            fwd(dev_vars, jnp.asarray(pp[i:i + INFER_BATCH]))
            for i in range(0, len(pp), INFER_BATCH)
        ])[:n]
        merged = merge_patches_device(
            probs, coords, scene.shape[0], scene.shape[1], size, 3,
            overlap=overlap)
        smooth = 1e-5
        ious = []
        for c in range(1, 3):  # ch-1.. convention
            p_ = merged[..., c] > 0
            g_ = gt[..., c] > 0
            ious.append(((p_ & g_).sum() + smooth) /
                        ((p_ | g_).sum() + smooth))
        return label, float(np.mean(ious))

    rows = [
        run("scene f32-unfused", None, False, False),
        run("scene bf16-fused (bench config)", jnp.bfloat16, True, False),
    ]
    tiles = np.stack(
        [val_ds[i][1] for i in range(len(val_ds))]).astype(np.float32)
    calibrate_int8(model, variables, tiles, batch_size=min(8, len(tiles)))
    rows.append(run("scene int8-fused (calibrated)", jnp.bfloat16, True, True))
    set_int8_calibration(None)
    set_int8_stage(False)

    base = rows[0][1]
    print("\n| Scene eval config | merged IoU | Δ |")
    print("|---|---|---|")
    for label, iou in rows:
        print(f"| {label} | {iou:.4f} | {iou - base:+.4f} |")
    d8 = abs(rows[2][1] - base)
    print(f"\nscene int8 IoU delta: {d8:.4f}  (bar: <= 0.005)")
    return 0 if d8 <= 0.005 else 1


if __name__ == "__main__":
    raise SystemExit(main())
