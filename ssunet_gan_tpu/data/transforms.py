"""Joint image+mask augmentations — albumentations-equivalent, numpy/cv2.

The reference composes albumentations transforms in the trainers
(train.py:339-354):

    Rotate([-10, 10], value=mean, mask_value=0)
    Flip()
    HueSaturationValue(10, 10, 10)
    RandomBrightnessContrast(0.10, 0.10, brightness_by_max=True)
    Resize(input_h, input_w)
    Normalize(mean=imagenet_mean, std=imagenet_std)

albumentations is not available in this environment, and the rebuild keeps
augmentation in the host data plane anyway (cheap uint8 ops on small tiles;
the TPU stays busy with the jitted step).  Each transform reproduces the
albumentations math: default apply-probability 0.5 for the stochastic ones,
linear interpolation + constant border for image rotation with nearest for
masks, uint8 HSV arithmetic, ``max_pixel_value=255`` normalization.

Every transform is ``t(image, mask, rng)`` → ``(image, mask)`` with a
``numpy.random.Generator`` so loader workers stay independent and seedable.
"""

from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Transform:
    p: float = 0.5

    def __call__(self, image: np.ndarray, mask: Optional[np.ndarray], rng: np.random.Generator):
        if rng.random() < self.p:
            return self.apply(image, mask, rng)
        return image, mask

    def apply(self, image, mask, rng):
        raise NotImplementedError


class Compose:
    """albumentations.Compose equivalent: ``aug(image=..., mask=...)`` dict API."""

    def __init__(self, transforms: Sequence[Transform], seed: Optional[int] = None):
        self.transforms = list(transforms)
        self._rng = np.random.default_rng(seed)

    def __call__(self, image: np.ndarray, mask: Optional[np.ndarray] = None, rng=None):
        rng = rng or self._rng
        for t in self.transforms:
            image, mask = t(image, mask, rng)
        out = {"image": image}
        if mask is not None:
            out["mask"] = mask
        return out


class Rotate(Transform):
    """Random rotation with constant-border fill (albumentations.Rotate).

    ``value`` fills the image border (the reference passes the imagenet mean
    as floats, which on uint8 images fills near-black — preserved);
    ``mask_value`` fills the mask border.  Image uses bilinear sampling,
    mask nearest.
    """

    def __init__(self, limit=(-90, 90), value=0, mask_value=0, p=0.5):
        self.limit = (limit, -limit) if np.isscalar(limit) else tuple(limit)
        self.value = value
        self.mask_value = mask_value
        self.p = p

    def apply(self, image, mask, rng):
        angle = rng.uniform(min(self.limit), max(self.limit))
        h, w = image.shape[:2]
        m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
        value = self.value
        if isinstance(value, (list, tuple)):
            value = tuple(float(v) for v in value)
        image = cv2.warpAffine(
            image, m, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=value,
        )
        if mask is not None:
            mask = cv2.warpAffine(
                mask, m, (w, h), flags=cv2.INTER_NEAREST,
                borderMode=cv2.BORDER_CONSTANT, borderValue=self.mask_value,
            )
            if mask.ndim == 2:
                mask = mask[..., None]
        return image, mask


class Flip(Transform):
    """albumentations.Flip: when applied, flips horizontally, vertically, or
    both with equal probability."""

    def __init__(self, p=0.5):
        self.p = p

    def apply(self, image, mask, rng):
        d = int(rng.integers(-1, 2))  # -1 both, 0 vertical, 1 horizontal
        image = cv2.flip(image, d)
        if mask is not None:
            mask = cv2.flip(mask, d)
            if mask.ndim == 2:
                mask = mask[..., None]
        return image, mask


class HorizontalFlip(Transform):
    def __init__(self, p=0.5):
        self.p = p

    def apply(self, image, mask, rng):
        image = image[:, ::-1].copy()
        if mask is not None:
            mask = mask[:, ::-1].copy()
        return image, mask


class HueSaturationValue(Transform):
    """uint8 HSV shifts (albumentations.HueSaturationValue)."""

    def __init__(self, hue_shift_limit=20, sat_shift_limit=30, val_shift_limit=20, p=0.5):
        self.hue = hue_shift_limit
        self.sat = sat_shift_limit
        self.val = val_shift_limit
        self.p = p

    def apply(self, image, mask, rng):
        if image.ndim != 3 or image.shape[2] != 3:
            return image, mask  # grayscale path: no-op (albumentations errors; we skip)
        hs = rng.uniform(-self.hue, self.hue)
        ss = rng.uniform(-self.sat, self.sat)
        vs = rng.uniform(-self.val, self.val)
        # albumentations F.shift_hsv converts with COLOR_RGB2HSV regardless of
        # the actual channel order — the reference feeds cv2-loaded BGR
        # through it, so reproducing its observable behaviour means using the
        # RGB conversion here too (not BGR2HSV).
        hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
        h, s, v = cv2.split(hsv)
        # float shifts truncate AFTER the mod/clip, exactly like
        # albumentations' LUT construction (np.mod(...)/np.clip(...) then
        # .astype(uint8)) — int(shift)-first is off by one for negative
        # fractional shifts.
        lut = np.mod(np.arange(256, dtype=np.float64) + hs, 180).astype(np.uint8)
        h = cv2.LUT(h, lut)
        lut = np.clip(np.arange(256, dtype=np.float64) + ss, 0, 255).astype(np.uint8)
        s = cv2.LUT(s, lut)
        lut = np.clip(np.arange(256, dtype=np.float64) + vs, 0, 255).astype(np.uint8)
        v = cv2.LUT(v, lut)
        return cv2.cvtColor(cv2.merge((h, s, v)), cv2.COLOR_HSV2RGB), mask


class RandomBrightnessContrast(Transform):
    """albumentations.RandomBrightnessContrast with brightness_by_max."""

    def __init__(self, brightness_limit=0.2, contrast_limit=0.2,
                 brightness_by_max=True, p=0.5):
        self.brightness = brightness_limit
        self.contrast = contrast_limit
        self.by_max = brightness_by_max
        self.p = p

    def apply(self, image, mask, rng):
        alpha = 1.0 + rng.uniform(-self.contrast, self.contrast)
        beta = rng.uniform(-self.brightness, self.brightness)
        img = image.astype(np.float32) * alpha
        img += beta * (255.0 if self.by_max else img.mean())
        return np.clip(img, 0, 255).astype(image.dtype), mask


class Resize(Transform):
    """albumentations.Resize(height, width): bilinear image, nearest mask."""

    def __init__(self, height: int, width: int, p=1.0):
        self.height = int(height)
        self.width = int(width)
        self.p = p

    def __call__(self, image, mask, rng):  # p=1: always applied
        return self.apply(image, mask, rng)

    def apply(self, image, mask, rng):
        image = cv2.resize(image, (self.width, self.height), interpolation=cv2.INTER_LINEAR)
        if image.ndim == 2:
            image = image[..., None]
        if mask is not None:
            mask = cv2.resize(mask, (self.width, self.height), interpolation=cv2.INTER_NEAREST)
            if mask.ndim == 2:
                mask = mask[..., None]
        return image, mask


class Normalize(Transform):
    """albumentations.Normalize: (img − mean·255) / (std·255), float32 out."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD, max_pixel_value=255.0, p=1.0):
        self.mean = np.asarray(mean, np.float32) * max_pixel_value
        self.std = np.asarray(std, np.float32) * max_pixel_value
        self.p = p

    def __call__(self, image, mask, rng):
        return self.apply(image, mask, rng)

    def apply(self, image, mask, rng):
        if image.ndim == 2:
            image = image[..., None]
        c = image.shape[2]
        mean = self.mean if c == len(self.mean) else np.full(c, self.mean.mean(), np.float32)
        std = self.std if c == len(self.std) else np.full(c, self.std.mean(), np.float32)
        return (image.astype(np.float32) - mean) / std, mask


def train_transform(config: dict) -> Compose:
    """The reference's train pipeline (train.py:339-349)."""
    mean, std = list(IMAGENET_MEAN), list(IMAGENET_STD)
    return Compose([
        Rotate([config.get("rotate_min", -10), config.get("rotate_max", 10)],
               value=mean, mask_value=0),
        Flip(),
        HueSaturationValue(10, 10, 10),
        RandomBrightnessContrast(0.10, 0.10, brightness_by_max=True),
        Resize(config["input_h"], config["input_w"]),
        Normalize(mean=mean, std=std),
    ])


def val_transform(config: dict) -> Compose:
    """The reference's val/test pipeline (train.py:351-354)."""
    return Compose([
        Resize(config["input_h"], config["input_w"]),
        Normalize(),
    ])
