"""Preprocess pipeline tests: grid parity vs the reference scripts, full
tiling runs on synthetic scenes, directory/list-file contract."""

import os
from glob import glob

import cv2
import numpy as np
import pytest

from ssunet_gan_tpu.data.preprocess import (
    binarize_mask,
    color_class_mask,
    make_data_list,
    preprocess_color_label_scenes,
    preprocess_grayscale_label_scenes,
    preprocess_grid_coords,
    split_scenes,
)
from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("shape,p,frac", [((600, 600), 256, 1.0), ((600, 700), 256, 0.5),
                                          ((1024, 1024), 512, 1.0)])
def test_grid_matches_reference_preprocess(reference_path, rng, shape, p, frac):
    """preprocess_satellite.patch_gen uses stride = frac·p_size with a 2-pass
    grid (preprocess_satellite.py:26-59 with overlap=1.0; preprocess_SN7.py
    same shape with overlap=0.5)."""
    import importlib

    mod = importlib.import_module(
        "preprocess_satellite" if frac == 1.0 else "preprocess_SN7"
    )
    img = rng.integers(0, 255, (*shape, 3), np.uint8)
    ref_imgs, _ = mod.patch_gen(img, img, p)
    coords = preprocess_grid_coords(shape[0], shape[1], p, frac)
    assert len(coords) == len(ref_imgs)
    for (y, x), ref in zip(coords, ref_imgs):
        np.testing.assert_array_equal(img[y : y + p, x : x + p], ref)


def test_binarize_and_color_decode():
    m = np.array([[0, 100, 126, 200, 255]], np.uint8)
    out = binarize_mask(m, 125)
    np.testing.assert_array_equal(out, [[0, 0, 255, 255, 255]])

    lab = np.zeros((2, 2, 3), np.uint8)
    lab[0, 0] = (255, 255, 255)
    lab[0, 1] = (255, 0, 0)
    lab[1, 0] = (0, 0, 255)
    assert color_class_mask(lab, 0)[0, 0] == 255
    assert color_class_mask(lab, 1)[0, 1] == 255
    assert color_class_mask(lab, 2)[1, 0] == 255
    assert color_class_mask(lab, 1)[0, 0] == 0


def _write_color_scenes(root, n=10, hw=300):
    rng = np.random.default_rng(5)
    d = os.path.join(root, "town")
    os.makedirs(d, exist_ok=True)
    for s in range(n):
        img = rng.integers(0, 256, (hw, hw, 3), np.uint8)
        cv2.imwrite(f"{d}/s{s}_image.png", img)
        lab = np.full((hw, hw, 3), 255, np.uint8)
        lab[rng.random((hw, hw)) > 0.7] = (255, 0, 0)
        cv2.imwrite(f"{d}/s{s}_labels.png", lab)


def test_color_label_pipeline(tmp_path):
    root = str(tmp_path)
    _write_color_scenes(root, n=10, hw=300)
    out = preprocess_color_label_scenes(root, "town", img_size=64, patch_size=128,
                                        num_class=3)
    # 80/10/10 split over 10 scenes
    assert len(glob(os.path.join(out, "images", "training", "*.png"))) > 0
    assert len(glob(os.path.join(out, "images", "validation", "*.png"))) > 0
    assert len(glob(os.path.join(out, "images", "test", "*.png"))) > 0
    # per-class dirs + combined index mask + list files
    for c in range(3):
        assert os.path.isdir(os.path.join(out, "annotations", "training", str(c)))
    combined = glob(os.path.join(out, "annotations", "training", "*.png"))
    assert combined
    idx_mask = cv2.imread(combined[0], cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(idx_mask)) <= {0, 1, 2}
    for split in ("training", "validation", "test"):
        assert os.path.exists(os.path.join(out, "list", f"{split}.txt"))
    # class masks are binary
    m = cv2.imread(glob(os.path.join(out, "annotations", "training", "1", "*.png"))[0],
                   cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(m)) <= {0, 255}


def test_grayscale_label_pipeline(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(6)
    d = os.path.join(root, "SN7")
    os.makedirs(f"{d}/image", exist_ok=True)
    for c in range(2):
        os.makedirs(f"{d}/label/{c}", exist_ok=True)
    for s in range(10):
        img = rng.integers(0, 256, (300, 300, 3), np.uint8)
        cv2.imwrite(f"{d}/image/sn_img_{s}.png", img)
        for c in range(2):
            m = (rng.random((300, 300)) > 0.6).astype(np.uint8) * 255
            cv2.imwrite(f"{d}/label/{c}/sn_label_{s}.png", m)
    out = preprocess_grayscale_label_scenes(root, "SN7", img_size=64, patch_size=128,
                                            num_class=2, stride_frac=0.5)
    train_imgs = glob(os.path.join(out, "images", "training", "*.png"))
    assert train_imgs
    # 0.5-stride grid yields more patches than non-overlapping would
    assert len(train_imgs) >= 8
    for c in range(2):
        n_masks = len(glob(os.path.join(out, "annotations", "training", str(c), "*.png")))
        assert n_masks == len(train_imgs)


def test_split_scenes_deterministic():
    paths = [f"s{i}" for i in range(10)]
    a = split_scenes(paths)
    b = split_scenes(paths)
    assert a == b
    assert len(a[0]) == 8 and len(a[1]) == 1 and len(a[2]) == 1
