"""SRGAN data/utility helpers.

Behaviour-parity re-implementations of /root/reference/scripts/srgan_utils.py
in numpy/PIL (no torch):

- :func:`create_data_lists`   ← srgan_utils.py:19-51 (size-filtered JSON lists)
- :func:`convert_image`       ← srgan_utils.py:54-103 (format conversions incl.
  imagenet-norm and the PSNR/SSIM y-channel with its 4-pixel border crop)
- :class:`ImageTransforms`    ← srgan_utils.py:106-162 (HR crop + bicubic LR)
- :func:`adjust_learning_rate`← srgan_utils.py:207-217, adapted to the
  functional LR schedulers (lr is an explicit step argument here, so the
  helper shrinks a scheduler's base rate)
- ``save_checkpoint``         ← srgan_utils.py:198-204 is orbax state saving
  in this framework: :func:`ssunet_gan_tpu.train.checkpoint.save_train_state`
- ``clip_gradient``           ← srgan_utils.py:186-195 lives inside the jitted
  GAN step (:mod:`ssunet_gan_tpu.train.gan_step`)

Arrays are HWC (single image) or NHWC (batch), channels RGB, float32.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np

RGB_WEIGHTS = np.array([65.481, 128.553, 24.966], np.float32)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

SOURCES = {"pil", "[0, 1]", "[-1, 1]"}
TARGETS = {"pil", "[0, 255]", "[0, 1]", "[-1, 1]", "imagenet-norm", "y-channel"}


def create_data_lists(train_folders: Sequence[str], test_folders: Sequence[str],
                      min_size: int, output_folder: str) -> None:
    """Size-filtered image path lists → JSON (srgan_utils.py:19-51)."""
    from PIL import Image

    print("\nCreating data lists... this may take some time.\n")
    train_images: List[str] = []
    for d in train_folders:
        for name in sorted(os.listdir(d)):
            img_path = os.path.join(d, name)
            img = Image.open(img_path, mode="r")
            if img.width >= min_size and img.height >= min_size:
                train_images.append(img_path)
    print("There are %d images in the training data.\n" % len(train_images))
    os.makedirs(output_folder, exist_ok=True)
    with open(os.path.join(output_folder, "train_images.json"), "w") as j:
        json.dump(train_images, j)

    for d in test_folders:
        test_images: List[str] = []
        test_name = d.rstrip("/").split("/")[-1]
        for name in sorted(os.listdir(d)):
            img_path = os.path.join(d, name)
            img = Image.open(img_path, mode="r")
            if img.width >= min_size and img.height >= min_size:
                test_images.append(img_path)
        print("There are %d images in the %s test data.\n" % (len(test_images), test_name))
        with open(os.path.join(output_folder, test_name + "_test_images.json"), "w") as j:
            json.dump(test_images, j)


def convert_image(img, source: str, target: str):
    """Convert between image formats (srgan_utils.py:54-103).

    HWC/NHWC RGB arrays; 'pil' accepts/returns PIL images.
    """
    assert source in SOURCES, "Cannot convert from source format %s!" % source
    assert target in TARGETS, "Cannot convert to target format %s!" % target

    if source == "pil":
        img = np.asarray(img, np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
    elif source == "[0, 1]":
        img = np.asarray(img, np.float32)
    elif source == "[-1, 1]":
        img = (np.asarray(img, np.float32) + 1.0) / 2.0

    if target == "pil":
        from PIL import Image

        arr = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        return Image.fromarray(arr.squeeze() if arr.shape[-1] == 1 else arr)
    if target == "[0, 255]":
        return 255.0 * img
    if target == "[0, 1]":
        return img
    if target == "[-1, 1]":
        return 2.0 * img - 1.0
    if target == "imagenet-norm":
        return (img - IMAGENET_MEAN) / IMAGENET_STD
    if target == "y-channel":
        # luminance with the reference's 4-pixel border crop (srgan_utils.py:98-101)
        batched = img if img.ndim == 4 else img[None]
        y = (
            np.matmul(255.0 * batched[:, 4:-4, 4:-4, :], RGB_WEIGHTS) / 255.0 + 16.0
        )
        return y if img.ndim == 4 else y[0]
    raise AssertionError(target)


class ImageTransforms:
    """HR crop + bicubic LR downsample pipeline (srgan_utils.py:106-162)."""

    def __init__(self, split: str, crop_size: int, scaling_factor: int,
                 lr_img_type: str, hr_img_type: str, seed: int = 0):
        self.split = split.lower()
        assert self.split in {"train", "test"}
        self.crop_size = crop_size
        self.scaling_factor = scaling_factor
        self.lr_img_type = lr_img_type
        self.hr_img_type = hr_img_type
        self._rng = np.random.default_rng(seed)

    def __call__(self, img):
        from PIL import Image

        if self.split == "train":
            left = int(self._rng.integers(1, img.width - self.crop_size + 1))
            top = int(self._rng.integers(1, img.height - self.crop_size + 1))
            hr_img = img.crop((left, top, left + self.crop_size, top + self.crop_size))
        else:
            xr = img.width % self.scaling_factor
            yr = img.height % self.scaling_factor
            hr_img = img.crop((xr // 2, yr // 2, xr // 2 + img.width - xr,
                               yr // 2 + img.height - yr))
        lr_img = hr_img.resize(
            (hr_img.width // self.scaling_factor, hr_img.height // self.scaling_factor),
            Image.BICUBIC,
        )
        assert hr_img.width == lr_img.width * self.scaling_factor
        return (
            convert_image(lr_img, "pil", self.lr_img_type),
            convert_image(hr_img, "pil", self.hr_img_type),
        )


def adjust_learning_rate(scheduler, shrink_factor: float) -> float:
    """Shrink a scheduler's base rate (srgan_utils.py:207-217)."""
    print("\nDECAYING learning rate.")
    scheduler.base_lr *= shrink_factor
    if hasattr(scheduler, "current"):
        scheduler.current *= shrink_factor
    print("The new learning rate is %f\n" % scheduler.base_lr)
    return scheduler.base_lr
