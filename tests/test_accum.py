"""Gradient-accumulation equivalence tests.

k-microbatch accumulation must equal the k×-batch single step exactly for
BatchNorm-free models (same loss means, same averaged gradients, one
optimizer update). With BatchNorm the equivalence holds up to batch
statistics (documented in make_train_step); the flagship test checks the
step runs under the 8-device mesh and stays finite.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
from flax import linen as nn

from ssunet_gan_tpu.ops.conv import Conv2d
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.parallel import make_mesh, replicate, shard_batch
from ssunet_gan_tpu.train.optim import build_optimizer
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_train_step
from ssunet_gan_tpu.utils import jit_init


class TinyNet(nn.Module):
    """BN-free conv net → exact accumulation equivalence."""

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.relu(Conv2d(8, 3, padding=1, name="c1")(x))
        return Conv2d(2, 1, name="c2")(x)


def _setup(accum_steps):
    model = TinyNet()
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=True)
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-7})
    state = TrainState.create(variables, tx)
    step = make_train_step(model, bce_dice_loss, tx, 2, clip=0.7,
                           accum_steps=accum_steps)
    return model, state, step


def test_accumulation_matches_full_batch(rng):
    img = jnp.asarray(rng.normal(size=(8, 8, 8, 3)).astype(np.float32))
    tar = jnp.asarray((rng.random((8, 8, 8, 2)) > 0.5).astype(np.float32))
    lr = jnp.float32(1e-3)

    _, state1, step1 = _setup(1)
    s1, m1 = step1(state1, (img, tar), lr)

    _, state4, step4 = _setup(4)
    s4, m4 = step4(state4, (img, tar), lr)

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_accumulation_rejects_indivisible_batch(rng):
    import pytest

    img = jnp.zeros((6, 8, 8, 3))
    tar = jnp.zeros((6, 8, 8, 2))
    _, state, step = _setup(4)
    with pytest.raises(ValueError):
        step(state, (img, tar), jnp.float32(1e-3))


@pytest.mark.slow
def test_accumulation_flagship_on_mesh(rng):
    """Flagship (BN + SPADE + spectral-free) accumulated step runs sharded
    over the 8-device mesh and produces a finite loss."""
    from ssunet_gan_tpu.models import build_model

    mesh = make_mesh()
    n = mesh.shape["data"]
    k = 2
    model = build_model("UNet_R_SS_v2", 3, 3)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-7})
    state = replicate(mesh, TrainState.create(variables, tx))
    step = make_train_step(model, bce_dice_loss, tx, 3, clip=0.7, accum_steps=k)

    img = jnp.asarray(rng.normal(size=(k * n, 32, 32, 3)).astype(np.float32))
    tar = jnp.asarray((rng.random((k * n, 32, 32, 3)) > 0.5).astype(np.float32))
    batch = shard_batch(mesh, (img, tar))
    state, metrics = step(state, batch, jnp.float32(1e-3))
    assert np.isfinite(float(metrics["loss"]))
