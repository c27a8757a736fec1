"""Training-stack tests: optimizers/schedulers (torch parity), mesh helpers,
jitted train/eval steps (quirk preservation), checkpoint/resume, and a tiny
end-to-end synthetic experiment on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.norm import BatchNorm
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.parallel import make_mesh, replicate, shard_batch
from ssunet_gan_tpu.train.optim import (
    CosineAnnealingLR,
    MultiStepLR,
    ReduceLROnPlateau,
    build_optimizer,
    build_scheduler,
)
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_eval_step, make_train_step
from ssunet_gan_tpu.train import checkpoint as ckpt


class TinyNet(nn.Module):
    """Minimal conv-BN-conv segmentation head for fast step tests."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(8, 3, padding=1, name="conv1")(x)
        x = BatchNorm(8, name="bn1")(x, train)
        x = nn.relu(x)
        return Conv2d(self.num_classes, 1, name="head")(x)


def _tiny_state(tx, num_classes=2, in_ch=3):
    model = TinyNet(num_classes)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, in_ch)), True)
    return model, TrainState.create(variables, tx)


def test_scheduler_cosine_matches_torch_closed_form():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10, eta_min=0.01)
    ours = CosineAnnealingLR(0.1, 10, 0.01)
    for epoch in range(10):
        torch_lr = opt.param_groups[0]["lr"]
        assert ours.lr(epoch) == pytest.approx(torch_lr, rel=1e-6), epoch
        opt.step()
        tsched.step()


def test_scheduler_multistep_matches_torch():
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=[2, 4], gamma=0.5)
    ours = MultiStepLR(1.0, [2, 4], 0.5)
    for epoch in range(6):
        assert ours.lr(epoch) == pytest.approx(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()


def test_reduce_on_plateau_decays_after_patience():
    s = ReduceLROnPlateau(1.0, factor=0.1, patience=2, min_lr=0.001)
    s.step_plateau(1.0)  # best
    for _ in range(3):  # 3 bad epochs > patience 2
        s.step_plateau(2.0)
    assert s.lr(0) == pytest.approx(0.1)


def test_build_scheduler_only_sgd():
    cfg = {"optimizer": "Adam", "lr": 1e-4, "scheduler": "CosineAnnealingLR",
           "epochs": 10, "min_lr": 1e-5}
    s = build_scheduler(cfg)
    assert s.lr(5) == pytest.approx(1e-4)  # Adam ⇒ constant (train.py:318-320)


def test_adam_l2_weight_decay_matches_torch():
    """torch Adam weight_decay is L2-into-grad, not AdamW."""
    import torch

    w0 = np.array([0.5, -0.3], np.float32)
    g = np.array([0.1, 0.2], np.float32)
    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tp], lr=0.01, weight_decay=0.1)
    tp.grad = torch.tensor(g)
    for _ in range(3):
        topt.step()

    tx = build_optimizer({"optimizer": "Adam", "lr": 0.01, "weight_decay": 0.1})
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + 0.01 * u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6)


def test_sgd_nesterov_matches_torch():
    import torch

    w0 = np.array([1.0, -1.0], np.float32)
    g = np.array([0.3, -0.1], np.float32)
    tp = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, nesterov=True, weight_decay=0.01)
    for _ in range(3):
        tp.grad = torch.tensor(g)
        topt.step()

    tx = build_optimizer({"optimizer": "SGD", "lr": 0.1, "momentum": 0.9,
                          "nesterov": True, "weight_decay": 0.01})
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + 0.1 * u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6)


def test_mesh_and_sharding():
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    x = np.zeros((8, 4), np.float32)
    sx = shard_batch(mesh, x)
    assert sx.sharding.spec == jax.sharding.PartitionSpec("data")
    r = replicate(mesh, x)
    assert r.sharding.is_fully_replicated


def test_train_step_runs_and_learns(rng):
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-2, "weight_decay": 0.0})
    model, state = _tiny_state(tx)
    step = make_train_step(model, bce_dice_loss, tx, num_classes=2, clip=0.7)
    mesh = make_mesh()
    state = replicate(mesh, state)

    img = rng.normal(size=(8, 8, 8, 3)).astype(np.float32)
    mask = (rng.random((8, 8, 8, 2)) > 0.5).astype(np.float32)
    batch = shard_batch(mesh, (jnp.asarray(img), jnp.asarray(mask)))

    losses = []
    for _ in range(10):
        state, metrics = step(state, batch, jnp.float32(1e-2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 10
    # weight clamp quirk: clamp precedes the step (train.py:111-116), so
    # post-update params may exceed clip by at most ~one Adam step (lr)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert float(jnp.max(jnp.abs(leaf))) <= 0.7 + 1.5e-2
    # BN running stats actually updated
    assert float(jnp.abs(state.batch_stats["bn1"]["mean"]).sum()) > 0


def test_eval_step_uses_running_stats(rng):
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0.0})
    model, state = _tiny_state(tx)
    eval_step = make_eval_step(model, bce_dice_loss, num_classes=2)
    img = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mask = (rng.random((2, 8, 8, 2)) > 0.5).astype(np.float32)
    m1 = eval_step(state, (jnp.asarray(img), jnp.asarray(mask)))
    m2 = eval_step(state, (jnp.asarray(img), jnp.asarray(mask)))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]))  # no state mutation


def test_checkpoint_roundtrip(tmp_path, rng):
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0.0})
    model, state = _tiny_state(tx)
    d = str(tmp_path / "model_a")
    ckpt.save_model(d, jax.device_get(state.variables()))
    restored = ckpt.load_model(d, jax.device_get(state.variables()))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["conv1"]["kernel"]),
        np.asarray(state.params["conv1"]["kernel"]),
    )

    ckpt.save_train_state(d, jax.device_get(state), epoch=3, meta={"best_iou": 0.5})
    state2, meta = ckpt.restore_train_state(d, jax.device_get(state))
    assert meta["epoch"] == 3 and meta["best_iou"] == 0.5
    np.testing.assert_allclose(
        np.asarray(state2.params["head"]["kernel"]),
        np.asarray(state.params["head"]["kernel"]),
    )


def test_warm_start_strict_false():
    """Generator warm start copies matching leaves, skips mismatches
    (models_seg_gan.py:216-233 semantics)."""
    sup = {"params": {"conv1": {"kernel": np.ones((3, 3, 3, 8), np.float32)}},
           "batch_stats": {}}
    gen = {
        "params": {"net": {"conv1": {"kernel": np.zeros((3, 3, 3, 8), np.float32)},
                           "extra": {"kernel": np.zeros((1, 1, 8, 2), np.float32)}}},
    }
    merged, report = ckpt.warm_start_generator(gen, sup)
    np.testing.assert_allclose(merged["params"]["net"]["conv1"]["kernel"], 1.0)
    np.testing.assert_allclose(merged["params"]["net"]["extra"]["kernel"], 0.0)
    assert "params.conv1.kernel" in report["loaded"][0] or report["loaded"]


@pytest.mark.slow
def test_end_to_end_synthetic_experiment(tmp_path):
    """Minimum end-to-end slice (SURVEY.md §7 stage 3): synthetic data →
    jitted train step → eval → best-checkpoint save → resume, on the
    8-device CPU mesh."""
    from ssunet_gan_tpu.config import ExperimentConfig, FilePaths
    from ssunet_gan_tpu.train.supervised import run_experiment

    opt = {
        "name": "synth_ssunet", "arch": "SSUNet", "epochs": 2, "batch_size": 8,
        "deep_supervision": False, "input_channels": 3, "num_classes": 2,
        "input_w": 32, "input_h": 32, "loss": "BCEDiceLoss",
        "optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-7,
        "momentum": 0.9, "nesterov": False, "scheduler": "ConstantLR",
        "min_lr": 1e-5, "clip": 0.7, "early_stopping": -1, "num_workers": 2,
        "dataset": "synth", "val_dataset": "synth",
        "img_ext": ".png", "mask_ext": ".png", "resume": False,
    }
    cfg = ExperimentConfig(
        file_path=FilePaths(
            input_path=str(tmp_path / "inputs"),
            model_path=str(tmp_path / "models"),
            output_path=str(tmp_path / "outputs"),
            checkpoint_path=str(tmp_path / "checkpoint"),
        ),
        opt_config=opt,
        val_config={},
    )
    state, best_iou, log = run_experiment(cfg, synthetic=8, use_tensorboard=False)
    assert len(log) == 2
    model_dir = os.path.join(cfg.file_path.model_path, "synth_ssunet")
    assert os.path.isdir(os.path.join(model_dir, "model.orbax"))
    assert os.path.exists(os.path.join(model_dir, "config.yml"))
    assert os.path.exists(os.path.join(model_dir, "log.csv"))

    # resume continues from epoch 2
    opt["resume"] = True
    state, best_iou, log2 = run_experiment(
        cfg, synthetic=8, epochs_override=3, use_tensorboard=False
    )
    assert list(log2["epoch"]) == [2]


def test_deep_supervision_train_step(rng):
    """Deep-supervision branch: loss averaged over heads, metrics on the last
    head without channel slicing (train.py:84-95)."""
    from ssunet_gan_tpu.models import build_model

    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 0.0})
    model = build_model("NestedUNet", 2, 3, deep_supervision=True)
    variables = jax.jit(lambda k, x: model.init(k, x, True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    state = TrainState.create(variables, tx)
    step = make_train_step(model, bce_dice_loss, tx, num_classes=2,
                           deep_supervision=True, clip=0.7)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 32, 32, 2)) > 0.5).astype(np.float32))
    state, metrics = step(state, (img, mask), jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
    assert 0 <= float(metrics["iou"]) <= 1


def test_dataset_from_file_preload(tmp_path, rng):
    """from_file fast path (dataset.py:100-102 / image_to_afile)."""
    import cv2

    from ssunet_gan_tpu.data.dataset import SegmentationDataset, image_to_afile

    img_dir = tmp_path / "img"
    mask_dir = tmp_path / "ann"
    img_dir.mkdir()
    for c in range(2):
        (mask_dir / str(c)).mkdir(parents=True)
    img = rng.integers(0, 255, (16, 16, 3), np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), img)
    for c in range(2):
        cv2.imwrite(str(mask_dir / str(c) / "a.png"),
                    (rng.random((16, 16)) > 0.5).astype(np.uint8) * 255)

    preload = image_to_afile(str(img_dir), str(mask_dir), None, ["a"],
                             {"img_ext": ".png", "mask_ext": ".png"})
    ds = SegmentationDataset(["a"], str(img_dir), str(mask_dir), ".png", ".png",
                             2, 3, from_file=preload)
    ori, im, mask, meta = ds[0]
    np.testing.assert_array_equal(ori, preload["a"]["img"])
    assert im.shape == (16, 16, 3) and mask.shape == (16, 16, 2)


@pytest.mark.slow
def test_flagship_overfits_fixed_batch(rng):
    """Learning sanity: UNet_R_SS_v2 overfits one fixed batch to high IoU
    with the reference's weight-clamp quirk active (verified to reach
    IoU=1.0 in ~120 steps on TPU; CPU runs a shorter horizon)."""
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.utils import jit_init

    B, S, C = 4, 32, 2
    img = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    mask = np.stack([(img[..., 0] > 0), (img[..., 1] > 0)], axis=-1).astype(np.float32)
    x, y = jnp.asarray(img), jnp.asarray(mask)

    model = build_model("UNet_R_SS_v2", C, 3)
    v = jit_init(model, jax.random.PRNGKey(0), x[:1], train=True)
    tx = build_optimizer({"optimizer": "Adam", "lr": 3e-4, "weight_decay": 1e-7})
    state = TrainState.create(v, tx)
    step = make_train_step(model, bce_dice_loss, tx, C, clip=0.7)
    first = None
    for i in range(60):
        state, m = step(state, (x, y), jnp.float32(3e-4))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < 0.5 * first
    assert float(m["iou"]) > 0.5
