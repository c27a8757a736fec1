"""Offline raster preprocessing: tile giant scenes into training patches.

Re-implements the reference's two preprocessing pipelines:

- **aerial RGB-label ("chicago")** — preprocess_satellite.py: 2-pass grid
  (TL- and BR-anchored) with stride = ``stride_frac·p_size`` (the script
  names this "overlap" and uses 1.0, i.e. non-overlapping,
  preprocess_satellite.py:30-33), patch 512, color-coded BGR label decoded
  per class ((255,255,255)→0, (255,0,0)→1, (0,0,255)→2,
  preprocess_satellite.py:102-112), resize to img_size, binarize at 125
  (its post_process uses 125, not the API's 127 —
  preprocess_satellite.py:63-69), per-class mask dirs + combined index mask;
- **SpaceNet-7** — preprocess_SN7.py: stride_frac 0.5 (50% overlap),
  per-class *grayscale* source labels under ``label/<c>/`` with
  ``img``→``label`` name substitution (preprocess_SN7.py:201-208),
  num_class 2.

Both split scenes 80/10/10 with ``train_test_split(random_state=41)``
applied twice (preprocess_satellite.py:139-141) and write the
``images/{split}`` + ``annotations/{split}/<class>`` tree that
:class:`~ssunet_gan_tpu.data.dataset.SegmentationDataset` consumes, plus
``list/{split}.txt`` index files.
"""

from __future__ import annotations

import math
import os
from glob import glob
from typing import List, Sequence, Tuple

import cv2
import numpy as np

SPLITS = ("training", "validation", "test")


def preprocess_grid_coords(img_h: int, img_w: int, p_size: int,
                           stride_frac: float = 1.0) -> List[Tuple[int, int]]:
    """2-pass preprocess grid (preprocess_satellite.py:26-59): TL-anchored
    then BR-anchored, count = floor(size/stride) − 1 per axis."""
    step = int(stride_frac * p_size)
    i_w = int(math.floor(img_w / step)) - 1
    i_h = int(math.floor(img_h / step)) - 1
    coords: List[Tuple[int, int]] = []
    for i in range(i_w):
        for j in range(i_h):
            coords.append((j * step, i * step))
    for i in range(i_w):
        for j in range(i_h):
            coords.append((img_h - j * step - p_size, img_w - i * step - p_size))
    return coords


def binarize_mask(mask: np.ndarray, threshold: int = 125) -> np.ndarray:
    """uint8 → {0, 255} at the preprocess threshold (preprocess_satellite.py:63-69)."""
    out = mask.copy()
    out[(out > threshold) & (out < 255)] = 255
    out[(out > 0) & (out <= threshold)] = 0
    return out


def color_class_mask(label_bgr: np.ndarray, idx: int) -> np.ndarray:
    """Color-coded BGR label → binary uint8 mask for one class
    (preprocess_satellite.py:102-112)."""
    keys = {0: (255, 255, 255), 1: (255, 0, 0), 2: (0, 0, 255)}
    b, g, r = keys.get(idx, (255, 255, 255))
    hit = (
        (label_bgr[:, :, 0] == b) & (label_bgr[:, :, 1] == g) & (label_bgr[:, :, 2] == r)
    )
    return np.where(hit, 255, 0).astype(np.uint8)


def split_scenes(paths: Sequence[str]) -> Tuple[List[str], List[str], List[str]]:
    """80/10/10 scene split, sklearn random_state=41 twice
    (preprocess_satellite.py:139-141)."""
    from sklearn.model_selection import train_test_split

    train, val_test = train_test_split(list(paths), test_size=0.2, random_state=41)
    if len(val_test) < 2:
        # tiny scene counts: reuse the held-out scene for both eval splits
        # (the reference crashes here; a usable split is strictly better)
        return train, list(val_test), list(val_test)
    val, test = train_test_split(val_test, test_size=0.5, random_state=41)
    return train, val, test


def _make_dirs(out_base: str, num_class: int) -> None:
    for split in SPLITS:
        os.makedirs(os.path.join(out_base, "images", split), exist_ok=True)
        os.makedirs(os.path.join(out_base, "annotations", split), exist_ok=True)
        for c in range(num_class):
            os.makedirs(os.path.join(out_base, "annotations", split, str(c)), exist_ok=True)
    os.makedirs(os.path.join(out_base, "masks"), exist_ok=True)


def make_data_list(out_base: str) -> None:
    """Write list/{split}.txt of 'image annotation' pairs
    (preprocess_satellite.py:165-216)."""
    os.makedirs(os.path.join(out_base, "list"), exist_ok=True)
    for split in SPLITS:
        imgs = sorted(glob(os.path.join(out_base, "images", split, "*.*")))
        anns = sorted(glob(os.path.join(out_base, "annotations", split, "*.*")))
        with open(os.path.join(out_base, "list", f"{split}.txt"), "w") as f:
            for i_path, a_path in zip(imgs, anns):
                f.write(
                    f"images/{split}/{os.path.basename(i_path)} "
                    f"annotations/{split}/{os.path.basename(a_path)}\n"
                )


def preprocess_color_label_scenes(
    input_root: str,
    image_name: str = "chicago",
    img_size: int = 512,
    patch_size: int = 512,
    num_class: int = 3,
    stride_frac: float = 1.0,
) -> str:
    """The preprocess_satellite pipeline; returns the output dataset dir."""
    image_paths = sorted(glob(os.path.join(input_root, image_name, "*_image.*")))
    if not image_paths:
        raise FileNotFoundError(
            os.path.join(input_root, image_name, "*_image.*")
        )
    out_base = os.path.join(input_root, f"{image_name}_{img_size}")
    _make_dirs(out_base, num_class)

    for split, paths in zip(SPLITS, split_scenes(image_paths)):
        data_cnt = 0
        for img_path in paths:
            label_path = img_path.replace("image", "labels")
            img = cv2.imread(img_path)
            label = cv2.imread(label_path)
            if img is None or label is None:
                raise FileNotFoundError(f"{img_path} / {label_path}")
            coords = preprocess_grid_coords(img.shape[0], img.shape[1], patch_size,
                                            stride_frac)
            for (y, x) in coords:
                data_cnt += 1
                file_name = "{:s}_{:05d}.png".format(image_name, data_cnt)
                p_img = img[y : y + patch_size, x : x + patch_size]
                p_lab = label[y : y + patch_size, x : x + patch_size]
                cv2.imwrite(
                    os.path.join(out_base, "images", split, file_name),
                    cv2.resize(p_img, (img_size, img_size)),
                )
                all_mask = np.zeros((img_size, img_size), np.uint8)
                for c in range(num_class):
                    mask = color_class_mask(p_lab, c)
                    resized = binarize_mask(cv2.resize(mask, (img_size, img_size)))
                    all_mask[resized > 0] = c
                    cv2.imwrite(
                        os.path.join(out_base, "annotations", split, str(c), file_name),
                        resized,
                    )
                cv2.imwrite(
                    os.path.join(out_base, "annotations", split, file_name), all_mask
                )
        print(f"{split}: {data_cnt} patches from {len(paths)} scenes")
    make_data_list(out_base)
    return out_base


def preprocess_grayscale_label_scenes(
    input_root: str,
    image_name: str = "SN7",
    img_size: int = 512,
    patch_size: int = 512,
    num_class: int = 2,
    stride_frac: float = 0.5,
) -> str:
    """The preprocess_SN7 pipeline (per-class grayscale label dirs)."""
    image_paths = sorted(glob(os.path.join(input_root, image_name, "image", "*.png")))
    if not image_paths:
        raise FileNotFoundError(os.path.join(input_root, image_name, "image", "*.png"))
    out_base = os.path.join(input_root, f"{image_name}_{img_size}")
    _make_dirs(out_base, num_class)

    for split, paths in zip(SPLITS, split_scenes(image_paths)):
        data_cnt = 0
        for img_path in paths:
            i_name = os.path.basename(img_path)
            label_dir = os.path.dirname(img_path).replace("image", "label")
            img = cv2.imread(img_path)
            if img is None:
                raise FileNotFoundError(img_path)
            coords = preprocess_grid_coords(img.shape[0], img.shape[1], patch_size,
                                            stride_frac)
            class_masks = []
            for c in range(num_class):
                # 'img' → 'label' name substitution (preprocess_SN7.py:201-203)
                l_path = os.path.join(label_dir, str(c), i_name).replace("img", "label")
                m = cv2.imread(l_path, cv2.IMREAD_GRAYSCALE)
                if m is None:
                    raise FileNotFoundError(l_path)
                class_masks.append(binarize_mask(m))
            for k, (y, x) in enumerate(coords):
                file_name = "{:s}_{:05d}.png".format(image_name, data_cnt + k + 1)
                p_img = img[y : y + patch_size, x : x + patch_size]
                cv2.imwrite(
                    os.path.join(out_base, "images", split, file_name),
                    cv2.resize(p_img, (img_size, img_size)),
                )
                all_mask = np.zeros((img_size, img_size), np.uint8)
                for c in range(num_class):
                    p_m = class_masks[c][y : y + patch_size, x : x + patch_size]
                    resized = binarize_mask(cv2.resize(p_m, (img_size, img_size)))
                    all_mask[resized > 0] = c
                    cv2.imwrite(
                        os.path.join(out_base, "annotations", split, str(c), file_name),
                        resized,
                    )
                cv2.imwrite(
                    os.path.join(out_base, "annotations", split, file_name), all_mask
                )
            data_cnt += len(coords)
        print(f"{split}: {data_cnt} patches from {len(paths)} scenes")
    make_data_list(out_base)
    return out_base
