"""One-step training parity vs the reference's torch pipeline.

Builds the same tiny SSUNet in torch (reference archs) and here, converts the
torch init weights over, runs ONE supervised train step on an identical batch
through both stacks — reference semantics: BCEDiceLoss, weight clamp before
step (train.py:111-116), SGD(lr, weight_decay) — and compares the updated
parameters.  (SGD, not Adam: Adam's first step is ±lr·sign(m̂), so any
floating-point sign flip on a near-zero gradient element shows as a 2·lr
delta; SGD keeps numerical noise proportional to the noise itself.)  This jointly verifies loss, gradients, clamp ordering, and the
optimizer math end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.compat import convert_torch_state_dict
from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.losses import bce_dice_loss
from ssunet_gan_tpu.train.optim import build_optimizer
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_train_step
from tests.conftest import requires_reference

LR = 1e-3
WD = 1e-7
CLIP = 0.7


@requires_reference
def test_one_train_step_parity(reference_path, rng):
    import torch
    import archs as ref_archs
    import losses as ref_losses

    torch.manual_seed(17)
    ref_model = ref_archs.SSUNet(2, 3, False)
    ref_model.train()
    criterion = ref_losses.BCEDiceLoss()
    optimizer = torch.optim.SGD(ref_model.parameters(), lr=LR, momentum=0.9,
                                weight_decay=WD)

    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    mask = (rng.random((2, 2, 32, 32)) > 0.5).astype(np.float32)

    # --- our stack, warm-started from the torch init weights --------------
    model = build_model("SSUNet", 2, 3)
    xj = jnp.asarray(img.transpose(0, 2, 3, 1))
    mj = jnp.asarray(mask.transpose(0, 2, 3, 1))
    variables = jax.jit(lambda k, x: model.init(k, x, True))(
        jax.random.PRNGKey(0), xj[:1]
    )
    variables, report = convert_torch_state_dict(ref_model.state_dict(), variables)
    assert not report["unmatched"], report["unmatched"][:8]

    tx = build_optimizer({"optimizer": "SGD", "lr": LR, "momentum": 0.9,
                          "nesterov": False, "weight_decay": WD})
    state = TrainState.create(variables, tx)
    step = make_train_step(model, bce_dice_loss, tx, num_classes=2, clip=CLIP)
    state, metrics = step(state, (xj, mj), jnp.float32(LR))

    # --- reference step (train.py:79-116) ----------------------------------
    t_img = torch.tensor(img)
    t_mask = torch.tensor(mask)
    output = ref_model(t_img)
    output[torch.isnan(output)] = 0
    loss = criterion(output, t_mask)
    for p in ref_model.parameters():
        p.data.clamp_(-CLIP, CLIP)
    optimizer.zero_grad()
    loss.backward()
    optimizer.step()

    assert float(metrics["loss"]) == pytest.approx(float(loss.item()), rel=1e-4)

    # compare a representative set of updated tensors
    sd = ref_model.state_dict()
    pairs = [
        ("conv0_0.conv1.weight", state.params["conv0_0"]["conv1"]["kernel"], (2, 3, 1, 0)),
        ("final.weight", state.params["final"]["kernel"], (2, 3, 1, 0)),
        ("SPADE2_2.mlp_gamma.weight", state.params["SPADE2_2"]["mlp_gamma"]["kernel"], (2, 3, 1, 0)),
        ("conv0_0.bn1.weight", state.params["conv0_0"]["bn1"]["scale"], None),
    ]
    for torch_key, ours, perm in pairs:
        ref_w = sd[torch_key].detach().numpy()
        if perm is not None:
            ref_w = ref_w.transpose(*perm)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(ours)), ref_w, atol=5e-5, rtol=1e-3,
            err_msg=torch_key,
        )

    # BN running stats after one training forward
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state.batch_stats["conv0_0"]["bn1"]["mean"])),
        sd["conv0_0.bn1.running_mean"].numpy(), atol=1e-5, rtol=1e-4,
    )
