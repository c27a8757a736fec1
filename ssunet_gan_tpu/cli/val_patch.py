"""Whole-scene sliding-window evaluation.

    python -m ssunet_gan_tpu.cli.val_patch --config <file>

Mirrors the live part of /root/reference/scripts/val_patch.py:444-481 (the
other ~420 lines are a commented-out older copy): iterate ``*_image.*``
scenes under ``val_config.full_image_path`` through the inference API —
patch → batched tile forward → device merge → overlay writers.
"""

from __future__ import annotations

import argparse
import os
from glob import glob

from ssunet_gan_tpu.config import load_experiment_config
from ssunet_gan_tpu.infer.api import (
    get_patched_input,
    load_segmentation_models,
    save_image_color_masking,
    segmentation_inference,
)


def parse_args():
    parser = argparse.ArgumentParser(description="whole-scene evaluation")
    parser.add_argument("--config", required=True, help="config file")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = load_experiment_config(args.config)
    val_config = cfg.val_config
    output_folder = cfg.file_path.output_path

    gt_mask_flag = bool(val_config.get("gt_mask_flag", False))
    if isinstance(val_config.get("gt_mask_flag"), str):
        gt_mask_flag = "False" not in val_config["gt_mask_flag"]

    model, variables, config = load_segmentation_models(args.config)
    os.makedirs(os.path.join(output_folder, config["name"]), exist_ok=True)

    scene_glob = os.path.join(val_config["full_image_path"], "*_image.*")
    scenes = sorted(glob(scene_glob))
    if not scenes:
        print(f"no scenes match {scene_glob}")
        return
    for img_path in scenes:
        image_name = os.path.splitext(os.path.basename(img_path))[0]
        print(f"=> {image_name}")
        img_input, img_patch_set, mask_patch_set = get_patched_input(
            img_path, config, gt_mask_flag, raw_uint8=True
        )
        all_class_mask, gt_class_mask = segmentation_inference(
            model, variables, img_input, img_patch_set, mask_patch_set,
            config, gt_mask_flag,
        )
        save_image_color_masking(
            output_folder, image_name, img_input, all_class_mask, gt_class_mask,
            config, gt_mask_flag,
        )


if __name__ == "__main__":
    main()
