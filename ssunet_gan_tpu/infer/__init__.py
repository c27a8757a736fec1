"""Inference API (SURVEY.md §1 L6) — whole-scene sliding-window segmentation."""

from ssunet_gan_tpu.infer.api import (  # noqa: F401
    get_patched_input,
    load_segmentation_models,
    save_image_color_masking,
    segmentation_inference,
)
