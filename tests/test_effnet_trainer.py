"""Dual-optimizer ('effnet' in arch) trainer path: label split + per-branch
learning rates (train.py:274-301, 118-120 — functional here, unlike the
reference where the cnn step runs on zeroed grads)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.train.optim import (
    build_cnn_optimizer,
    build_optimizer,
    encoder_param_labels,
)
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_train_step


class FakeEff(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return Conv2d(8, 1, name="stem")(x)


class FakeEncoder(nn.Module):
    def setup(self):
        self.eff_conv = FakeEff()
        self.conv_a = Conv2d(8, 1)

    def __call__(self, x, train=True):
        return self.conv_a(self.eff_conv(x, train))


class FakeEffNet(nn.Module):
    num_classes: int = 2

    def setup(self):
        self.encoder = FakeEncoder()
        self.head = Conv2d(self.num_classes, 1, name="head")

    def __call__(self, x, train=True):
        return self.head(self.encoder(x, train))


def test_encoder_param_labels():
    model = FakeEffNet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    labels = encoder_param_labels(v["params"])
    assert labels["encoder"]["eff_conv"]["stem"]["kernel"] == "cnn"
    assert labels["encoder"]["conv_a"]["kernel"] == "main"
    assert labels["head"]["kernel"] == "main"


def test_dual_lr_freezes_then_trains_encoder(rng):
    model = FakeEffNet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    labels = encoder_param_labels(v["params"])
    cfg = {"optimizer": "Adam", "lr": 1e-2, "weight_decay": 0.0}
    tx = optax.multi_transform(
        {"main": build_optimizer(cfg), "cnn": build_cnn_optimizer(cfg)}, labels
    )
    state = TrainState.create(v, tx)
    step = make_train_step(model, bce_dice_loss, tx, num_classes=2,
                           param_labels=labels)

    img = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((2, 8, 8, 2)) > 0.5).astype(np.float32))

    enc0 = np.asarray(state.params["encoder"]["eff_conv"]["stem"]["kernel"])
    head0 = np.asarray(state.params["head"]["kernel"])

    # lr_cnn = 0 → encoder frozen, head moves (epochs 0-1 behaviour)
    state, _ = step(state, (img, mask), jnp.float32(1e-2), jnp.float32(0.0))
    enc1 = np.asarray(jax.device_get(state.params["encoder"]["eff_conv"]["stem"]["kernel"]))
    head1 = np.asarray(jax.device_get(state.params["head"]["kernel"]))
    np.testing.assert_array_equal(enc0, enc1)
    assert not np.allclose(head0, head1)

    # lr_cnn > 0 → encoder trains too (epoch ≥ 2)
    state, _ = step(state, (img, mask), jnp.float32(1e-2), jnp.float32(1e-3))
    enc2 = np.asarray(jax.device_get(state.params["encoder"]["eff_conv"]["stem"]["kernel"]))
    assert not np.allclose(enc1, enc2)


@pytest.mark.slow
def test_effnet_unet_forward_shape(rng):
    from ssunet_gan_tpu.models import build_model

    model = build_model("effnet_unet", 3, 3)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    v = jax.jit(lambda k, a: model.init(k, a, False))(jax.random.PRNGKey(0), x)
    out = model.apply(v, x, False)
    assert out.shape == (1, 64, 64, 3)
