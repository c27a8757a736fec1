"""Aux-subsystem tests: srgan utils, TruncatedVGG19, ScenePatchDataset,
profiling helpers."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.srgan_utils import (
    ImageTransforms,
    adjust_learning_rate,
    convert_image,
    create_data_lists,
)
from ssunet_gan_tpu.models.vgg import TruncatedVGG19, truncation_point, VGG19_PLAN
from tests.conftest import requires_reference


def test_convert_image_roundtrips(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(convert_image(img, "[0, 1]", "[-1, 1]"), 2 * img - 1)
    np.testing.assert_allclose(
        convert_image(2 * img - 1, "[-1, 1]", "[0, 1]"), img, atol=1e-6
    )
    np.testing.assert_allclose(convert_image(img, "[0, 1]", "[0, 255]"), 255 * img)
    norm = convert_image(img, "[0, 1]", "imagenet-norm")
    assert norm.shape == img.shape


def test_convert_image_y_channel(rng):
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    y = convert_image(img, "[0, 1]", "y-channel")
    assert y.shape == (2, 8, 8)  # 4-pixel border crop each side
    # white → Y == 16 + (65.481+128.553+24.966)
    white = np.ones((1, 16, 16, 3), np.float32)
    yw = convert_image(white, "[0, 1]", "y-channel")
    np.testing.assert_allclose(yw, 16 + 65.481 + 128.553 + 24.966, rtol=1e-5)


def test_image_transforms(tmp_path):
    from PIL import Image

    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 80, 3), np.uint8))
    t = ImageTransforms("train", crop_size=32, scaling_factor=4,
                        lr_img_type="[0, 1]", hr_img_type="[-1, 1]")
    lr, hr = t(img)
    assert lr.shape == (8, 8, 3) and hr.shape == (32, 32, 3)
    assert hr.min() >= -1 and hr.max() <= 1

    t2 = ImageTransforms("test", crop_size=0, scaling_factor=4,
                         lr_img_type="[0, 1]", hr_img_type="[0, 1]")
    lr, hr = t2(img)
    assert hr.shape[0] % 4 == 0 and hr.shape[1] % 4 == 0
    assert lr.shape[0] * 4 == hr.shape[0]


def test_create_data_lists(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    Image.new("RGB", (50, 50)).save(d / "small.png")
    Image.new("RGB", (120, 120)).save(d / "big.png")
    create_data_lists([str(d)], [str(d)], min_size=100, output_folder=str(tmp_path))
    with open(tmp_path / "train_images.json") as f:
        train = json.load(f)
    assert len(train) == 1 and train[0].endswith("big.png")
    assert os.path.exists(tmp_path / "imgs_test_images.json")


def test_adjust_learning_rate():
    from ssunet_gan_tpu.train.optim import ConstantLR

    s = ConstantLR(0.1)
    adjust_learning_rate(s, 0.5)
    assert s.lr(0) == pytest.approx(0.05)


@requires_reference
def test_vgg_truncation_point_matches_reference(reference_path):
    """The truncation index must select the same layer set as the reference's
    torch-layer walk (models_seg_gan.py:320-341) for the SRGAN (i=5, j=4)."""
    # reference walk over torchvision vgg19.features cfg 'E':
    # conv idx per (i, j) — compute expected number of convs kept
    keep = truncation_point(5, 4)
    plan = VGG19_PLAN[:keep]
    n_convs = sum(1 for e in plan if e != "M")
    n_pools = sum(1 for e in plan if e == "M")
    assert n_convs == 16 and n_pools == 4  # all convs through conv5_4

    with pytest.raises(AssertionError):
        truncation_point(9, 9)


def test_truncated_vgg_shape(rng):
    model = TruncatedVGG19(i=2, j=2)  # shallow for CPU speed
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 16, 16, 128)  # one pool, 128 channels


def test_scene_patch_dataset(tmp_path, rng):
    import cv2

    from ssunet_gan_tpu.data.dataset import ScenePatchDataset

    d = tmp_path / "scenes"
    d.mkdir()
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    lab = rng.integers(0, 255, (96, 96, 3), np.uint8)
    cv2.imwrite(str(d / "a_image.png"), img)
    cv2.imwrite(str(d / "a_labels.png"), lab)

    ds = ScenePatchDataset(str(d / "*_image.*"), ".png", ".png", num_classes=3,
                           input_channels=3, image_w=32, psize=64, patch_overlap=0.5)
    assert len(ds) == 1
    img_input, mask_input, img_set, mask_patch, meta = ds[0]
    assert img_input.shape == (96, 96, 3)
    assert img_set.shape[1:] == (32, 32, 3)
    assert len(img_set) == len(meta["coords"]) == len(mask_patch)
    assert meta["img_id"] == "a_image"


def test_step_timer():
    from ssunet_gan_tpu.profiling import StepTimer, time_jitted

    t = StepTimer()
    t.update(8)
    t.update(8)
    assert t.steps == 2 and t.items == 16
    assert t.items_per_sec > 0

    stats = time_jitted(jax.jit(lambda x: x * 2), jnp.ones((8, 8)), iters=2)
    assert stats["mean_s"] > 0 and stats["compile_s"] > 0


def test_api_loads_gan_generator_checkpoint(tmp_path):
    """load_segmentation_models falls back to the Generator-wrapped template
    for GAN-trained checkpoints (the reference's API crashes on these)."""
    import json
    import yaml

    from ssunet_gan_tpu.infer.api import load_segmentation_models
    from ssunet_gan_tpu.models.gan import Generator
    from ssunet_gan_tpu.train import checkpoint as ckpt
    from ssunet_gan_tpu.utils import jit_init

    card = {"arch": "SSUNet", "num_classes": 2, "input_channels": 3,
            "deep_supervision": False, "input_w": 32, "input_h": 32}
    model_dir = tmp_path / "models" / "ganmodel"
    model_dir.mkdir(parents=True)
    with open(model_dir / "config.yml", "w") as f:
        yaml.dump(card, f)

    gen = Generator.from_config(card)
    v = jax.device_get(
        jit_init(gen, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    )
    ckpt.save_model(str(model_dir), v)

    cfg = {"file_path": {"model_path": str(tmp_path / "models"),
                         "input_path": str(tmp_path), "output_path": str(tmp_path),
                         "checkpoint_path": str(tmp_path)},
           "opt_config": {},
           "val_config": {"name": "ganmodel", "patch_overlap": 0.5}}
    cfg_path = tmp_path / "c.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    model, variables, config = load_segmentation_models(str(cfg_path))
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), False)
    assert out.shape == (1, 32, 32, 2)
    assert config["patch_size"] == 1024


def test_effective_patch_size_clamps():
    from ssunet_gan_tpu.infer.api import effective_patch_size

    assert effective_patch_size(2048, 2048, 1024) == 1024
    assert effective_patch_size(768, 900, 1024) == 768
    assert effective_patch_size(701, 900, 1024) == 700  # kept even
