"""Patch-training dataset (reference ``Dataset``, dataset.py:47-144).

Directory convention preserved exactly:

    <dataset>/images/<split>/<id><img_ext>
    <dataset>/annotations/<split>/<class_index>/<id><mask_ext>   (num_classes > 1)
    <dataset>/annotations/<split>/<id><mask_ext>                 (num_classes == 1)

Behaviour parity:
- 3-channel images read BGR (cv2 default); 1-channel read grayscale and
  expanded to HWC (dataset.py:97-105);
- multi-class masks: per-class grayscale files binarized via ``/255`` then
  uint8 cast (dataset.py:127-131), stacked to HWC;
- the joint transform runs on (image, mask) together (dataset.py:112/132);
- output stays **HWC float32** — the NHWC layout is what TPU convs want,
  so the reference's final CHW transpose (dataset.py:139-142) is dropped
  by design.

Items are ``(ori_img, img, mask, meta)`` — the reference's 5th element
(``masks``) is an always-empty list in the multi-class path and unused by
every trainer, so it is not reproduced.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np


def list_split_ids(input_folder: str, dataset: str, split: str, img_ext: str) -> List[str]:
    """Glob image ids for a split (train.py:333-336)."""
    paths = glob(os.path.join(input_folder, dataset, "images", split, "*" + img_ext))
    return sorted(os.path.splitext(os.path.basename(p))[0] for p in paths)


class SegmentationDataset:
    """Map-style dataset mirroring the reference's ``Dataset``."""

    def __init__(
        self,
        img_ids: Sequence[str],
        img_dir: str,
        mask_dir: str,
        img_ext: str,
        mask_ext: str,
        num_classes: int,
        input_channels: int = 3,
        transform=None,
    ):
        self.img_ids = list(img_ids)
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.img_ext = img_ext
        self.mask_ext = mask_ext
        self.num_classes = int(num_classes)
        self.input_channels = int(input_channels)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.img_ids)

    def _read_image(self, img_id: str) -> np.ndarray:
        path = os.path.join(self.img_dir, img_id + self.img_ext)
        if self.input_channels == 3:
            img = cv2.imread(path)
        else:
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is not None:
                img = img[..., None]
        if img is None:
            raise FileNotFoundError(path)
        return img

    def _read_mask(self, img_id: str) -> np.ndarray:
        if self.num_classes == 1:
            path = os.path.join(self.mask_dir, img_id + self.mask_ext)
            m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if m is None:
                raise FileNotFoundError(path)
            return m[..., None].astype(np.uint8)
        chans = []
        for i in range(self.num_classes):
            path = os.path.join(self.mask_dir, str(i), img_id + self.mask_ext)
            m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if m is None:
                raise FileNotFoundError(path)
            # /255 binarize then uint8 (dataset.py:129-131)
            chans.append((m.astype(np.float32) / 255.0).astype(np.uint8)[..., None])
        return np.dstack(chans)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
        img_id = self.img_ids[idx]
        img = self._read_image(img_id)
        ori_img = img
        mask = self._read_mask(img_id)
        if self.transform is not None:
            augmented = self.transform(image=img, mask=mask)
            img = augmented["image"]
            mask = augmented["mask"]
        img = np.ascontiguousarray(img, dtype=np.float32)
        mask = np.ascontiguousarray(mask, dtype=np.float32)
        return ori_img, img, mask, {"img_id": img_id}


class SyntheticDataset:
    """Deterministic synthetic scenes for tests/benchmarks (no files needed).

    Images are random uint8 textures with class-wise blobs; masks are the
    blob indicators.  Mirrors SegmentationDataset's item contract.
    """

    def __init__(self, n: int, h: int, w: int, num_classes: int,
                 input_channels: int = 3, transform=None, seed: int = 0):
        self.n, self.h, self.w = n, h, w
        self.num_classes = num_classes
        self.input_channels = input_channels
        self.transform = transform
        self.seed = seed
        self.img_ids = [f"synth_{i:04d}" for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        img = rng.integers(0, 256, (self.h, self.w, self.input_channels), np.uint8)
        mask = np.zeros((self.h, self.w, self.num_classes), np.uint8)
        for c in range(self.num_classes):
            cy, cx = rng.integers(0, self.h), rng.integers(0, self.w)
            r = int(rng.integers(self.h // 8, self.h // 3))
            yy, xx = np.mgrid[: self.h, : self.w]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
            mask[..., c] = blob
            ch = c % self.input_channels
            img[..., ch] = np.where(blob, 255 - img[..., ch], img[..., ch])
        ori = img
        if self.transform is not None:
            augmented = self.transform(image=img, mask=mask)
            img, mask = augmented["image"], augmented["mask"]
        return (
            ori,
            np.ascontiguousarray(img, np.float32),
            np.ascontiguousarray(mask, np.float32),
            {"img_id": self.img_ids[idx]},
        )
