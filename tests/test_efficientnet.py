"""EfficientNet encoder tests: scaling math, shape contracts, and forward
parity vs the reference's vendored torch implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.compat import convert_torch_state_dict
from ssunet_gan_tpu.models.efficientnet import (
    AttentiveCNN,
    EfficientNet,
    decode_block_string,
    round_filters,
    round_repeats,
    scaled_block_args,
)
from tests.conftest import requires_reference


def test_block_string_decode():
    a = decode_block_string("r2_k5_s22_e6_i24_o40_se0.25")
    assert (a.num_repeat, a.kernel_size, a.stride) == (2, 5, 2)
    assert (a.input_filters, a.output_filters, a.expand_ratio) == (24, 40, 6)
    assert a.se_ratio == 0.25 and a.id_skip


@requires_reference
def test_scaling_matches_reference(reference_path):
    from efficientnet_pytorch import utils as ref_utils

    for name in ("efficientnet-b0", "efficientnet-b2", "efficientnet-b5"):
        w, d, _, _ = ref_utils.efficientnet_params(name)
        _, gp = ref_utils.get_model_params(name, None)
        for f in (32, 16, 24, 320, 1280):
            assert round_filters(f, w) == ref_utils.round_filters(f, gp)
        for r in (1, 2, 3, 4):
            assert round_repeats(r, d) == ref_utils.round_repeats(r, gp)


def test_features_shape():
    model = EfficientNet("efficientnet-b0", features_only=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda k, v: model.init(k, v, False))(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 2, 2, 1280)  # 64/32 spatial, b0 head width


@requires_reference
def test_forward_parity_b0(reference_path, rng):
    import torch
    from efficientnet_pytorch import EfficientNet as RefEfficientNet

    torch.manual_seed(3)
    ref = RefEfficientNet.from_name("efficientnet-b0")
    ref.eval()

    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_feat = ref.extract_features(torch.tensor(x))

    model = EfficientNet("efficientnet-b0", features_only=True)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = jax.jit(lambda k, v: model.init(k, v, False))(jax.random.PRNGKey(0), xj)
    variables, report = convert_torch_state_dict(ref.state_dict(), variables)
    # features_only model has no classifier head; _fc.* have no counterpart
    unmatched = [k for k in report["unmatched"] if not k.startswith("_fc.")]
    assert not unmatched, unmatched[:8]
    out = model.apply(variables, xj, False)
    np.testing.assert_allclose(
        np.asarray(out), ref_feat.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-2
    )


def test_attentive_cnn_shape():
    model = AttentiveCNN("efficientnet-b2")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda k, v: model.init(k, v, False))(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, False)
    # b2 native res 260 → /32 → 9 spatial (ceil); 1024 projected channels
    assert out.shape[0] == 1 and out.shape[-1] == 1024
    assert out.shape[1] == out.shape[2] == 9
