"""GAN-stack tests: fused G/D step semantics and the end-to-end adversarial
fine-tune experiment (warm start → alternating steps → best-by-test-IoU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from ssunet_gan_tpu.models.gan import Discriminator
from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.ops.norm import BatchNorm
from ssunet_gan_tpu.parallel import make_mesh, replicate, shard_batch
from ssunet_gan_tpu.train.gan_step import make_gan_train_step
from ssunet_gan_tpu.train.optim import adam
from ssunet_gan_tpu.train.state import TrainState


class TinyGen(nn.Module):
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv2d(8, 3, padding=1, name="conv1")(x)
        x = BatchNorm(8, name="bn1")(x, train)
        x = nn.relu(x)
        return Conv2d(self.num_classes, 1, name="head")(x)


def _states(rng):
    gen = TinyGen(2)
    disc = Discriminator(num_classes=2, n_blocks=2, fc_size=16)
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), True)
    dv = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 2)), True)
    tx_g, tx_d = adam(), adam()
    return gen, disc, TrainState.create(gv, tx_g), TrainState.create(dv, tx_d), tx_g, tx_d


def test_gan_step_updates_both_networks(rng):
    gen, disc, g_state, d_state, tx_g, tx_d = _states(rng)
    step = make_gan_train_step(gen, disc, bce_dice_loss, tx_g, tx_d, num_classes=2)
    mesh = make_mesh()
    g_state, d_state = replicate(mesh, g_state), replicate(mesh, d_state)

    img = rng.normal(size=(8, 16, 16, 3)).astype(np.float32)
    mask = (rng.random((8, 16, 16, 2)) > 0.5).astype(np.float32)
    batch = shard_batch(mesh, (jnp.asarray(img), jnp.asarray(mask)))

    g_before = np.asarray(jax.device_get(g_state.params["head"]["kernel"]))
    d_bn_before = np.asarray(jax.device_get(d_state.batch_stats["block1"]["bn"]["mean"]))

    for _ in range(3):
        g_state, d_state, metrics = step(g_state, d_state, batch, jnp.float32(2e-5))

    for key in ("loss", "iou", "dice", "perceptual_loss", "adv_loss", "d_loss"):
        assert np.isfinite(float(metrics[key])), key
    assert float(metrics["perceptual_loss"]) > float(metrics["loss"])  # additive terms

    g_after = np.asarray(jax.device_get(g_state.params["head"]["kernel"]))
    assert not np.allclose(g_before, g_after)
    assert int(g_state.step) == 3 and int(d_state.step) == 3
    # D BN running stats updated (three applications per iteration)
    d_bn_after = np.asarray(jax.device_get(d_state.batch_stats["block1"]["bn"]["mean"]))
    assert not np.allclose(d_bn_before, d_bn_after)


def test_gan_grad_clip_limits_update(rng):
    """With huge lr=1, each Adam param move is bounded by lr·|m̂/√v̂| ≈ lr;
    the grad clip mainly shapes the moments — sanity-check updates stay finite
    and bounded."""
    gen, disc, g_state, d_state, tx_g, tx_d = _states(rng)
    step = make_gan_train_step(gen, disc, bce_dice_loss, tx_g, tx_d, num_classes=2,
                               grad_clip=0.8)
    img = 100.0 * rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    mask = (rng.random((2, 16, 16, 2)) > 0.5).astype(np.float32)
    before = np.asarray(g_state.params["head"]["kernel"])
    g_state, d_state, metrics = step(
        g_state, d_state, (jnp.asarray(img), jnp.asarray(mask)), jnp.float32(1.0)
    )
    after = np.asarray(jax.device_get(g_state.params["head"]["kernel"]))
    assert np.isfinite(after).all()
    assert np.max(np.abs(after - before)) < 10.0  # one Adam step at lr=1


@pytest.mark.slow
def test_end_to_end_gan_experiment(tmp_path):
    """train_seg_gan equivalent on synthetic data: supervised checkpoint →
    warm start → adversarial fine-tune → best-by-test-IoU save."""
    from ssunet_gan_tpu.config import ExperimentConfig, FilePaths
    from ssunet_gan_tpu.train.gan import run_gan_experiment
    from ssunet_gan_tpu.train.supervised import run_experiment

    opt = {
        "name": "synth_sup", "generator_name": "synth_sup", "arch": "SSUNet",
        "epochs": 1, "batch_size": 8, "deep_supervision": False,
        "input_channels": 3, "num_classes": 2, "input_w": 32, "input_h": 32,
        "loss": "BCEDiceLoss", "optimizer": "Adam", "lr": 1e-3,
        "gan_lr": 2e-5, "weight_decay": 1e-7, "momentum": 0.9,
        "nesterov": False, "scheduler": "ConstantLR", "min_lr": 1e-5,
        "clip": 0.7, "early_stopping": -1, "num_workers": 2,
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
    # supervised warm-up checkpoint
    run_experiment(cfg, synthetic=8, use_tensorboard=False)

    gan_opt = dict(opt, name="synth_gan")
    gan_cfg = ExperimentConfig(cfg.file_path, gan_opt, {})
    g_state, d_state, best_iou, log = run_gan_experiment(
        gan_cfg, synthetic=8, use_tensorboard=False
    )
    assert len(log) == 1
    model_dir = os.path.join(cfg.file_path.model_path, "synth_gan")
    assert os.path.exists(os.path.join(model_dir, "config.yml"))
    assert os.path.exists(os.path.join(model_dir, "log.csv"))
    assert np.isfinite(best_iou)


@pytest.mark.slow
def test_joint_gan_step_matches_alternating(rng):
    """r5 joint-scalar GAN gradient (shared fake forward): params update
    BIT-exactly like the alternating two-grad structure; D's running
    stats match to the ulp of the reconstructed third update."""
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.models.gan import Discriminator
    from ssunet_gan_tpu.ops.losses import bce_dice_loss
    from ssunet_gan_tpu.train import gan_step as gs
    from ssunet_gan_tpu.train.optim import build_optimizer
    from ssunet_gan_tpu.train.state import TrainState
    from ssunet_gan_tpu.utils import jit_init

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray((rng.random((2, 32, 32, 3)) > 0.5), jnp.float32)
    model = build_model("UNet", num_classes=3, input_channels=3)
    disc = Discriminator(num_classes=3, kernel_size=3, n_channels=8,
                         n_blocks=4, fc_size=64)
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-4,
                          "weight_decay": 0.0})
    g_vars = jit_init(model, jax.random.PRNGKey(0), x, train=True)
    d_vars = jit_init(disc, jax.random.PRNGKey(1), y, train=True)

    def run(joint):
        gs.set_joint_gan(joint)
        fresh = lambda t: jax.tree_util.tree_map(jnp.array, t)
        g_state = TrainState.create(fresh(g_vars), tx)
        d_state = TrainState.create(fresh(d_vars), tx)
        step = gs.make_gan_train_step(model, disc, bce_dice_loss, tx, tx, 3)
        g2, d2, m = step(g_state, d_state, (x, y), jnp.float32(1e-4))
        return jax.device_get((g2.params, d2.params, d2.batch_stats, m))

    try:
        gj, dj, bj, mj = run(True)
        ga, da, ba, ma = run(False)
    finally:
        gs.set_joint_gan(True)

    jax.tree_util.tree_map(np.testing.assert_array_equal, gj, ga)
    jax.tree_util.tree_map(np.testing.assert_array_equal, dj, da)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7),
        bj, ba)
    for k in mj:
        np.testing.assert_allclose(float(mj[k]), float(ma[k]), rtol=1e-6)
