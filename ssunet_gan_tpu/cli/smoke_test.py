"""End-to-end inference smoke test.

    python -m ssunet_gan_tpu.cli.smoke_test --config <file>

Mirrors /root/reference/scripts/aerial_image_segmentation_test.py:8-44: load
the model, run the full patched-inference pipeline on the FIRST scene found,
save overlays. The reference's only executable test.
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    args = parser.parse_args()

    cfg = load_experiment_config(args.config)
    val_config = cfg.val_config
    gt_mask_flag = bool(val_config.get("gt_mask_flag", False))
    if isinstance(val_config.get("gt_mask_flag"), str):
        gt_mask_flag = "False" not in val_config["gt_mask_flag"]

    model, variables, config = load_segmentation_models(args.config)
    scenes = sorted(glob(os.path.join(val_config["full_image_path"], "*_image.*")))
    assert scenes, "no scenes found"
    img_path = scenes[0]
    image_name = os.path.splitext(os.path.basename(img_path))[0]

    img_input, img_patch_set, mask_patch_set = get_patched_input(
        img_path, config, gt_mask_flag, raw_uint8=True
    )
    all_class_mask, gt_class_mask = segmentation_inference(
        model, variables, img_input, img_patch_set, mask_patch_set, config, gt_mask_flag
    )
    os.makedirs(os.path.join(cfg.file_path.output_path, config["name"]), exist_ok=True)
    save_image_color_masking(
        cfg.file_path.output_path, image_name, img_input, all_class_mask,
        gt_class_mask, config, gt_mask_flag,
    )
    print("smoke test ok:", image_name)


if __name__ == "__main__":
    main()
