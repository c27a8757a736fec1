"""Model zoo tests: shape contracts + forward parity vs the reference torch
archs (weights converted via ssunet_gan_tpu.compat)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.compat import convert_torch_state_dict
from ssunet_gan_tpu.models import ARCH_NAMES, ARCH_REGISTRY, build_model
from tests.conftest import requires_reference

H = W = 64  # six-level archs need /32; 64 keeps CPU time sane


def _forward(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train)
    return model.apply(variables, x, train, mutable=["batch_stats", "spectral"])[0], variables


@pytest.mark.parametrize("arch", list(ARCH_REGISTRY))
def test_shapes(arch, rng):
    num_classes, in_ch = 3, 3
    x = jnp.asarray(rng.normal(size=(1, H, W, in_ch)).astype(np.float32))
    model = build_model(arch, num_classes, in_ch)
    out, _ = _forward(model, x)
    if arch == "ProgUNet":
        assert isinstance(out, list) and len(out) == 4
        assert out[0].shape == (1, H, W, num_classes)
        assert out[1].shape == (1, H // 2, W // 2, num_classes)
    else:
        assert out.shape == (1, H, W, num_classes)


def test_nested_unet_deep_supervision(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("NestedUNet", 2, 3, deep_supervision=True)
    out, _ = _forward(model, x)
    assert isinstance(out, list) and len(out) == 4
    for o in out:
        assert o.shape == (1, 32, 32, 2)


def test_single_channel_single_class(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 1)).astype(np.float32))
    model = build_model("UNet", 1, 1)
    out, _ = _forward(model, x)
    assert out.shape == (1, 32, 32, 1)


def test_registry_contract():
    assert ARCH_NAMES == [
        "UNet", "NestedUNet", "SSUNet", "UNet_ori", "UNet_B_SS",
        "AttUNet", "UNet_R_SS", "UNet_R_SS_v2",
    ]
    with pytest.raises(KeyError):
        build_model("NoSuchArch", 1)


# ---------------------------------------------------------------------------
# forward parity vs reference torch archs


def _parity(arch_name, reference_path, rng, num_classes=3, in_ch=3, atol=2e-3):
    import torch
    import archs as ref_archs

    torch.manual_seed(7)
    ref_model = ref_archs.__dict__[arch_name](num_classes, in_ch, False)
    ref_model.eval()

    x = rng.normal(size=(2, in_ch, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.tensor(x))

    model = build_model(arch_name, num_classes, in_ch)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, False)
    variables, report = convert_torch_state_dict(ref_model.state_dict(), variables)
    assert not report["unmatched"], f"unmatched torch keys: {report['unmatched'][:10]}"

    out = model.apply(variables, x_nhwc, False)

    def cmp(got, ref):
        ref_nhwc = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), ref_nhwc, atol=atol, rtol=1e-3)

    if isinstance(out, list):
        assert len(out) == len(ref_out)
        for g, r in zip(out, ref_out):
            cmp(g, r)
    else:
        cmp(out, ref_out)


@requires_reference
@pytest.mark.parametrize(
    "arch",
    ["UNet", "UNet_ori", "AttUNet", "NestedUNet", "SSUNet", "UNet_B_SS",
     "UNet_R_SS", "UNet_R_SS_v2", "ProgUNet"],
)
def test_forward_parity(arch, reference_path, rng):
    _parity(arch, reference_path, rng)


@requires_reference
def test_discriminator_parity(reference_path, rng):
    import torch
    import models_seg_gan as ref_gan

    from ssunet_gan_tpu.compat.torch_loader import discriminator_fc1_transform
    from ssunet_gan_tpu.models.gan import Discriminator

    torch.manual_seed(3)
    num_classes = 3
    ref_d = ref_gan.Discriminator(num_classes, kernel_size=3, n_channels=64,
                                  n_blocks=8, fc_size=1024)
    ref_d.eval()

    x = rng.normal(size=(2, num_classes, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_d(torch.tensor(x))

    d = Discriminator(num_classes)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = d.init(jax.random.PRNGKey(0), x_nhwc, False)
    # final conv block has 512 channels (64·2^3 after 8 blocks)
    out_ch = ref_d.conv_blocks[-1].conv_block[0].out_channels
    variables, report = convert_torch_state_dict(
        ref_d.state_dict(), variables,
        special_transforms={"fc1.weight": discriminator_fc1_transform(out_ch)},
    )
    assert not report["unmatched"], report["unmatched"][:10]

    out = d.apply(variables, x_nhwc, False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-3, rtol=1e-3)


@requires_reference
def test_srresnet_parity(reference_path, rng):
    import torch
    import models_seg_gan as ref_gan

    from ssunet_gan_tpu.models.gan import SRResNet

    torch.manual_seed(5)
    ref_m = ref_gan.SRResNet(n_blocks=2, scaling_factor=2)
    ref_m.eval()
    x = rng.normal(size=(1, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_m(torch.tensor(x))

    m = SRResNet(n_blocks=2, scaling_factor=2)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = m.init(jax.random.PRNGKey(0), x_nhwc, False)
    variables, report = convert_torch_state_dict(ref_m.state_dict(), variables)
    assert not report["unmatched"], report["unmatched"][:10]
    out = m.apply(variables, x_nhwc, False)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )


@requires_reference
def test_spade_resnet_block_parity(reference_path, rng):
    """SPADEResnetBlock incl. spectral-norm eval path (archs.py:35-90)."""
    import torch
    import archs as ref_archs

    from ssunet_gan_tpu.ops.blocks import SPADEResnetBlock

    torch.manual_seed(11)
    ref_blk = ref_archs.SPADEResnetBlock(8, 16, {"num_class": 2, "opt_type": 1})
    ref_blk.eval()

    # The reference block's SPADE builds x2map: Conv2d(norm_nc=fin → 2), so
    # seg MUST have fin channels or the reference itself crashes — the block
    # only runs self-conditioned, like every SPADE use in this codebase.
    x = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    seg = rng.normal(size=(2, 8, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_blk(torch.tensor(x), torch.tensor(seg))

    blk = SPADEResnetBlock(fin=8, fout=16)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    sj = jnp.asarray(seg.transpose(0, 2, 3, 1))
    variables = blk.init(jax.random.PRNGKey(0), xj, sj, False)
    variables, report = convert_torch_state_dict(ref_blk.state_dict(), variables)
    assert not report["unmatched"], report["unmatched"][:10]
    out = blk.apply(variables, xj, sj, False)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy().transpose(0, 2, 3, 1), atol=2e-3, rtol=1e-3
    )


def test_wide_variant_registry_and_shapes(rng):
    """Opt-in MXU-wide flagship: registered, runs, padded low levels."""
    import jax
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.utils import jit_init

    model = build_model("UNet_R_SS_v2_wide", num_classes=3, input_channels=3)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 32, 32, 3)
    assert variables["params"]["conv0_0"]["conv1"]["kernel"].shape[-1] == 128
