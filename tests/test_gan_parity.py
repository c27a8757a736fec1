"""One-step GAN training parity vs the reference torch pipeline.

The adversarial step is the trickiest semantics in the stack: generator
gradients flow THROUGH a train-mode discriminator, losses combine as
seg + 1e-4·MSE + 1e-3·BCE(D(g_out), 1) (train_seg_gan.py:172-205), gradients
are value-clipped at ±0.8 (srgan_utils.py:186-195), and D trains on the
pre-update generator output (train_seg_gan.py:217-233).  This test builds
identical networks in torch (reference modules) and here, converts weights,
runs ONE alternating G/D step with plain SGD on both sides (Adam's ±lr first
step amplifies fp sign noise), and compares the updated parameters of both
networks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ssunet_gan_tpu.compat import convert_torch_state_dict, discriminator_fc1_transform
from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.models.gan import Discriminator
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.train.gan_step import make_gan_train_step
from ssunet_gan_tpu.train.state import TrainState
from tests.conftest import requires_reference

LR = 1e-3
CLIP = 0.8


def _sgd():
    return optax.chain(optax.scale(-1.0))


@requires_reference
def test_one_gan_step_parity(reference_path, rng):
    import torch
    import archs as ref_archs
    import losses as ref_losses
    import models_seg_gan as ref_gan

    torch.manual_seed(23)
    C = 2
    ref_g = ref_archs.SSUNet(C, 3, False)
    ref_d = ref_gan.Discriminator(C, kernel_size=3, n_channels=8, n_blocks=2,
                                  fc_size=1024)
    ref_g.train()
    ref_d.train()
    criterion = ref_losses.BCEDiceLoss()
    adv_criterion = torch.nn.BCEWithLogitsLoss()
    content_criterion = torch.nn.MSELoss()
    opt_g = torch.optim.SGD(ref_g.parameters(), lr=LR)
    opt_d = torch.optim.SGD(ref_d.parameters(), lr=LR)

    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    mask = (rng.random((2, C, 32, 32)) > 0.5).astype(np.float32)

    # ---- ours, warm-started from the torch inits --------------------------
    gen = build_model("SSUNet", C, 3)
    disc = Discriminator(num_classes=C, kernel_size=3, n_channels=8, n_blocks=2,
                         fc_size=1024)
    xj = jnp.asarray(img.transpose(0, 2, 3, 1))
    mj = jnp.asarray(mask.transpose(0, 2, 3, 1))
    gv = jax.jit(lambda k, x: gen.init(k, x, True))(jax.random.PRNGKey(0), xj[:1])
    dv = jax.jit(lambda k, x: disc.init(k, x, True))(jax.random.PRNGKey(1), mj[:1])
    gv, g_rep = convert_torch_state_dict(ref_g.state_dict(), gv)
    assert not g_rep["unmatched"], g_rep["unmatched"][:6]
    # fc1 flattens NCHW in torch, NHWC here — permute its kernel
    last_ch = dv["params"]["fc1"]["kernel"].shape[0] // 36
    dv, d_rep = convert_torch_state_dict(
        ref_d.state_dict(), dv,
        special_transforms={"fc1.weight": discriminator_fc1_transform(last_ch)},
    )
    assert not d_rep["unmatched"], d_rep["unmatched"][:6]

    tx_g, tx_d = _sgd(), _sgd()
    g_state = TrainState.create(gv, tx_g)
    d_state = TrainState.create(dv, tx_d)
    step = make_gan_train_step(gen, disc, bce_dice_loss, tx_g, tx_d, C,
                               grad_clip=CLIP)
    g_state, d_state, metrics = step(
        g_state, d_state, (xj, mj), jnp.float32(LR)
    )

    # ---- reference step (train_seg_gan.py:182-233) -------------------------
    t_img, t_mask = torch.tensor(img), torch.tensor(mask)
    g_out = ref_g(t_img)
    g_out[torch.isnan(g_out)] = 0
    seg_loss = criterion(g_out, t_mask)
    content = content_criterion(g_out, t_mask)
    d_fake = ref_d(g_out)
    adv = adv_criterion(d_fake, torch.ones_like(d_fake))
    perceptual = seg_loss + 1e-4 * content + 1e-3 * adv
    opt_g.zero_grad()
    perceptual.backward()
    for p in ref_g.parameters():
        if p.grad is not None:
            p.grad.data.clamp_(-CLIP, CLIP)
    opt_g.step()

    hr = ref_d(t_mask)
    sr = ref_d(g_out.detach())
    d_loss = adv_criterion(sr, torch.zeros_like(sr)) + adv_criterion(
        hr, torch.ones_like(hr)
    )
    opt_d.zero_grad()
    d_loss.backward()
    for p in ref_d.parameters():
        if p.grad is not None:
            p.grad.data.clamp_(-CLIP, CLIP)
    opt_d.step()

    assert float(metrics["loss"]) == pytest.approx(float(seg_loss.item()), rel=1e-4)
    assert float(metrics["perceptual_loss"]) == pytest.approx(
        float(perceptual.item()), rel=1e-4
    )
    assert float(metrics["d_loss"]) == pytest.approx(float(d_loss.item()), rel=1e-3)

    g_sd = ref_g.state_dict()
    np.testing.assert_allclose(
        np.asarray(jax.device_get(g_state.params["final"]["kernel"])),
        g_sd["final.weight"].numpy().transpose(2, 3, 1, 0), atol=5e-5, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(g_state.params["conv0_0"]["conv1"]["kernel"])),
        g_sd["conv0_0.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        atol=5e-5, rtol=1e-3,
    )
    d_sd = ref_d.state_dict()
    np.testing.assert_allclose(
        np.asarray(jax.device_get(d_state.params["block0"]["conv"]["kernel"])),
        d_sd["conv_blocks.0.conv_block.0.weight"].numpy().transpose(2, 3, 1, 0),
        atol=5e-5, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(d_state.params["fc2"]["kernel"])),
        d_sd["fc2.weight"].numpy().transpose(1, 0), atol=5e-5, rtol=1e-3,
    )
