"""Augmentation parity vs independently-written albumentations oracles.

albumentations cannot be installed here (no egress), so each oracle below
re-derives the *published* albumentations algorithm (its functional core is
a thin cv2/LUT wrapper) directly in the test, independently of
``data/transforms.py``:

- Rotate      → cv2.getRotationMatrix2D((w/2-0.5, h/2-0.5), angle, 1) +
                warpAffine (linear/const for image, nearest for mask)
- Flip        → cv2.flip with d ∈ {-1, 0, 1}
- HSV         → cvtColor RGB2HSV, LUT with mod-180 hue / clipped sat+val,
                float shifts truncated after mod/clip
- Brightness  → LUT: v·α + β·255 (brightness_by_max), clipped
- Normalize   → (img − mean·255) / (std·255)
- Resize      → cv2.resize INTER_LINEAR / INTER_NEAREST

The reference composes these in train.py:339-354.
"""

import cv2
import numpy as np
import pytest

from ssunet_gan_tpu.data import transforms as T


class FixedRng:
    """Deterministic stand-in for numpy Generator: scripted draws."""

    def __init__(self, uniforms=(), ints=()):
        self._u = list(uniforms)
        self._i = list(ints)

    def uniform(self, a, b):
        return self._u.pop(0)

    def integers(self, a, b):
        return self._i.pop(0)

    def random(self):
        return 0.0  # always under p → transform applies


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, (37, 45, 3), np.uint8)


@pytest.fixture
def mask(rng):
    return (rng.integers(0, 2, (37, 45, 1), np.uint8) * 255).astype(np.uint8)


def test_normalize_golden(img):
    out = T.Normalize()(img, None, FixedRng())[0]
    mean = np.array(T.IMAGENET_MEAN, np.float32) * 255
    std = np.array(T.IMAGENET_STD, np.float32) * 255
    want = (img.astype(np.float32) - mean) / std
    np.testing.assert_allclose(out, want, rtol=1e-6)
    assert out.dtype == np.float32


@pytest.mark.parametrize("hs,ss,vs", [(7.0, -12.0, 4.0), (-2.7, 3.3, -8.9), (0.0, 0.0, 0.0)])
def test_hsv_golden(img, hs, ss, vs):
    got, _ = T.HueSaturationValue(20, 20, 20).apply(img, None, FixedRng([hs, ss, vs]))

    # oracle: albumentations F.shift_hsv for uint8
    h, s, v = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    lut_h = np.mod(np.arange(256, dtype=np.float64) + hs, 180).astype(np.uint8)
    lut_s = np.clip(np.arange(256, dtype=np.float64) + ss, 0, 255).astype(np.uint8)
    lut_v = np.clip(np.arange(256, dtype=np.float64) + vs, 0, 255).astype(np.uint8)
    want = cv2.cvtColor(
        cv2.merge((cv2.LUT(h, lut_h), cv2.LUT(s, lut_s), cv2.LUT(v, lut_v))),
        cv2.COLOR_HSV2RGB,
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("alpha,beta", [(1.08, -0.07), (0.93, 0.09), (1.0, 0.0)])
def test_brightness_contrast_golden(img, alpha, beta):
    got, _ = T.RandomBrightnessContrast(0.1, 0.1).apply(
        img, None, FixedRng([alpha - 1.0, beta])
    )
    # oracle: albumentations uint8 LUT (value·α + β·255, clipped)
    lut = np.clip(np.arange(256, dtype=np.float32) * alpha + beta * 255.0, 0, 255)
    want = cv2.LUT(img, lut.astype(np.uint8))
    # LUT truncates; the float path rounds identically because the map only
    # depends on the input value — allow ±1 for float32-vs-float64 edges
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


@pytest.mark.parametrize("angle", [10.0, -7.3])
def test_rotate_golden(img, mask, angle):
    value = list(T.IMAGENET_MEAN)
    got_i, got_m = T.Rotate([-10, 10], value=value, mask_value=0).apply(
        img, mask, FixedRng([angle])
    )
    h, w = img.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2 - 0.5, h / 2 - 0.5), angle, 1.0)
    want_i = cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=tuple(float(v) for v in value),
    )
    want_m = cv2.warpAffine(
        mask, m, (w, h), flags=cv2.INTER_NEAREST,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )[..., None]
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_m, want_m)


@pytest.mark.parametrize("d", [-1, 0, 1])
def test_flip_golden(img, mask, d):
    got_i, got_m = T.Flip().apply(img, mask, FixedRng(ints=[d]))
    np.testing.assert_array_equal(got_i, cv2.flip(img, d))
    np.testing.assert_array_equal(got_m, cv2.flip(mask, d)[..., None])


def test_resize_golden(img, mask):
    got_i, got_m = T.Resize(24, 32)(img, mask, FixedRng())
    np.testing.assert_array_equal(
        got_i, cv2.resize(img, (32, 24), interpolation=cv2.INTER_LINEAR)
    )
    np.testing.assert_array_equal(
        got_m, cv2.resize(mask, (32, 24), interpolation=cv2.INTER_NEAREST)[..., None]
    )


def test_pipeline_deterministic_with_seed(img, mask):
    a = T.train_transform({"input_h": 24, "input_w": 24})
    b = T.train_transform({"input_h": 24, "input_w": 24})
    a._rng = np.random.default_rng(5)
    b._rng = np.random.default_rng(5)
    out_a = a(image=img, mask=mask)
    out_b = b(image=img, mask=mask)
    np.testing.assert_array_equal(out_a["image"], out_b["image"])
    np.testing.assert_array_equal(out_a["mask"], out_b["mask"])
