"""Native C++ tile-server parity vs the cv2/numpy host path.

The native path must be tile-for-tile interchangeable with the Python one
(reference semantics: aerial_image_segmentation_api.py:349-373 crops then
cv2.resize's each patch).  Exactness bars: crop is bit-exact; bilinear
resize is pinned to cv2's INTER_LINEAR within 1 LSB generally and bit-exact
at the power-of-two downscale the workflow runs (1024→512).
"""

import numpy as np
import pytest

from ssunet_gan_tpu import native
from ssunet_gan_tpu.data.tiling import extract_patches, grid_coords

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native tileserver not built"
)


def _cv2_tiles(scene, coords, p, oh, ow):
    out = np.empty((len(coords), oh, ow, scene.shape[2]), np.uint8)
    for k, (y, x) in enumerate(coords):
        out[k] = cv2.resize(scene[y : y + p, x : x + p], (ow, oh))
    return out


def test_extract_u8_bit_exact():
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 256, (300, 257, 3), np.uint8)
    coords = grid_coords(300, 257, 96, 0.5)
    got = native.extract_u8(scene, coords, 96)
    np.testing.assert_array_equal(got, extract_patches(scene, coords, 96))


def test_resize_2x_downscale_bit_exact():
    rng = np.random.default_rng(1)
    scene = rng.integers(0, 256, (1536, 1536, 3), np.uint8)
    coords = grid_coords(1536, 1536, 1024, 0.5)
    got = native.extract_resize_u8(scene, coords, 1024, 512, 512)
    np.testing.assert_array_equal(got, _cv2_tiles(scene, coords, 1024, 512, 512))


@pytest.mark.parametrize(
    "p,oh,ow",
    [(96, 64, 64), (100, 64, 64), (97, 51, 64), (64, 128, 96), (33, 7, 19)],
)
def test_resize_general_within_1lsb(p, oh, ow):
    rng = np.random.default_rng(p * 1000 + oh)
    scene = rng.integers(0, 256, (260, 310, 3), np.uint8)
    coords = grid_coords(260, 310, p, 0.4)
    got = native.extract_resize_u8(scene, coords, p, oh, ow)
    want = _cv2_tiles(scene, coords, p, oh, ow)
    assert np.max(np.abs(got.astype(np.int16) - want.astype(np.int16))) <= 1


def test_threads_deterministic():
    import os

    rng = np.random.default_rng(7)
    scene = rng.integers(0, 256, (512, 512, 3), np.uint8)
    coords = grid_coords(512, 512, 128, 0.5)
    old = os.environ.get("SSUNET_GAN_TPU_NATIVE_THREADS")
    try:
        os.environ["SSUNET_GAN_TPU_NATIVE_THREADS"] = "1"
        a = native.extract_resize_u8(scene, coords, 128, 64, 64)
        os.environ["SSUNET_GAN_TPU_NATIVE_THREADS"] = "4"
        b = native.extract_resize_u8(scene, coords, 128, 64, 64)
    finally:
        if old is None:
            os.environ.pop("SSUNET_GAN_TPU_NATIVE_THREADS", None)
        else:
            os.environ["SSUNET_GAN_TPU_NATIVE_THREADS"] = old
    np.testing.assert_array_equal(a, b)


def test_out_of_bounds_coords_rejected():
    scene = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError):
        native.extract_resize_u8(scene, np.array([[40, 0]]), 32, 16, 16)


def test_api_raw_path_uses_native(monkeypatch):
    """patch_and_preprocess(raw_uint8=True) output is identical with the
    native server on and off (the API contract the fast path rides)."""
    from ssunet_gan_tpu.infer import api

    rng = np.random.default_rng(3)
    scene = rng.integers(0, 256, (400, 400, 3), np.uint8)
    config = {
        "patch_size": 128, "input_h": 64, "input_w": 64,
        "patch_overlap": 0.5, "num_classes": 3, "deep_supervision": False,
    }
    tiles_n, masks_n = api.patch_and_preprocess(scene, scene, config,
                                                raw_uint8=True)
    monkeypatch.setattr(native, "extract_resize_u8",
                        lambda *a, **k: None)
    tiles_p, masks_p = api.patch_and_preprocess(scene, scene, config,
                                                raw_uint8=True)
    np.testing.assert_array_equal(masks_n, masks_p)
    assert (
        np.max(np.abs(tiles_n.astype(np.int16) - tiles_p.astype(np.int16)))
        <= 1
    )
