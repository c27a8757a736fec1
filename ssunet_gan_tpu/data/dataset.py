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
        from_file: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
    ):
        self.img_ids = list(img_ids)
        self.img_dir = img_dir
        self.mask_dir = mask_dir
        self.img_ext = img_ext
        self.mask_ext = mask_ext
        self.num_classes = int(num_classes)
        self.input_channels = int(input_channels)
        self.transform = transform
        # preloaded {id: {'img': array}} dict from image_to_afile
        # (dataset.py:100-102 from_file fast path)
        self.from_file = from_file

    def __len__(self) -> int:
        return len(self.img_ids)

    def _read_image(self, img_id: str) -> np.ndarray:
        if self.from_file is not None and self.input_channels == 3:
            return self.from_file[str(img_id)]["img"]
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


def image_to_afile(img_dir: str, mask_dir: str, base_name, img_ids: Sequence[str],
                   config: Dict) -> Dict[str, Dict[str, np.ndarray]]:
    """Preload scene images into an in-memory dict keyed by id
    (dataset.py:27-45) — the ``from_file`` fast path."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for img_id in img_ids:
        img = cv2.imread(os.path.join(img_dir, img_id + config["img_ext"]))
        out[str(img_id)] = {"img": img}
    return out


class ScenePatchDataset:
    """Whole-scene dataset: each item is one scene expanded into its 4-pass
    patch grid (reference ``DatasetPatch``, dataset.py:236-320).

    Items: ``(img_input, mask_input, img_patch_set, mask_patch_set, meta)``
    with patches resized to ``infer_size`` and HWC float32 layout (the
    reference's CHW transpose is dropped — NHWC is the TPU layout).
    """

    def __init__(self, scene_glob: str, img_ext: str, mask_ext: str,
                 num_classes: int, input_channels: int, image_w: int,
                 psize: int, patch_overlap: float, transform=None):
        from glob import glob as _glob

        self.img_paths = sorted(_glob(scene_glob))
        self.img_ext = img_ext
        self.mask_ext = mask_ext
        self.num_classes = num_classes
        self.transform = transform
        self.infer_size = image_w
        self.psize = psize
        self.patch_overlap = patch_overlap

    def __len__(self) -> int:
        return len(self.img_paths)

    def __getitem__(self, idx: int):
        from ssunet_gan_tpu.data.tiling import extract_patches, grid_coords

        img_path = self.img_paths[idx]
        label_path = img_path.replace("image", "labels")
        img_input = cv2.imread(img_path)
        mask_input = cv2.imread(label_path)
        if img_input is None:
            raise FileNotFoundError(img_path)
        if mask_input is None:
            mask_input = img_input
        coords = grid_coords(img_input.shape[0], img_input.shape[1], self.psize,
                             self.patch_overlap)
        image_patch = extract_patches(img_input, coords, self.psize)
        mask_patch = extract_patches(mask_input, coords, self.psize)

        s = self.infer_size
        img_set = np.empty((len(coords), s, s, img_input.shape[2]), np.float32)
        for k in range(len(coords)):
            img = cv2.resize(image_patch[k], (s, s))
            if self.transform is not None:
                img = self.transform(image=img)["image"]
            img_set[k] = img.astype(np.float32)
        meta = {"img_id": os.path.splitext(os.path.basename(img_path))[0],
                "coords": coords}
        return img_input, mask_input, img_set, mask_patch, meta


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
