"""ResNet-101 trunk: structure + forward parity vs a torch reconstruction.

torchvision is not installed (conftest stubs it), so the oracle is the
standard torchvision-v1 ResNet-101 architecture rebuilt in plain torch with
random weights — exactly what /root/reference/scripts/archs.py:446-449 wraps
(``children()[:-2]`` in a Sequential). The state_dict therefore carries the
same ``resnet_conv.<idx>...`` key structure a reference checkpoint would.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.compat.torch_loader import convert_torch_state_dict
from ssunet_gan_tpu.models.resnet import ResNet101Trunk
from ssunet_gan_tpu.utils import jit_init

torch = pytest.importorskip("torch")
nn = torch.nn


class _Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on conv2)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _make_torch_trunk():
    def layer(inplanes, planes, blocks, stride):
        down = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        mods = [_Bottleneck(inplanes, planes, stride, down)]
        for _ in range(blocks - 1):
            mods.append(_Bottleneck(planes * 4, planes))
        return nn.Sequential(*mods)

    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, 2, 1),
        layer(64, 64, 3, 1),
        layer(256, 128, 4, 2),
        layer(512, 256, 23, 2),
        layer(1024, 512, 3, 2),
    )


@pytest.fixture(scope="module")
def trunk_pair(rng_module=None):
    torch.manual_seed(0)
    t = _make_torch_trunk().eval()
    # randomize BN running stats so eval-mode parity actually tests them
    g = np.random.default_rng(7)
    with torch.no_grad():
        for name, buf in t.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.tensor(g.normal(size=buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.tensor((g.random(buf.shape) + 0.5).astype(np.float32)))

    model = ResNet101Trunk()
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)

    sd = {f"resnet_conv.{k}": v for k, v in t.state_dict().items()}
    wrapped = {
        "params": {"resnet_conv": variables["params"]},
        "batch_stats": {"resnet_conv": variables["batch_stats"]},
    }
    converted, report = convert_torch_state_dict(sd, wrapped)
    flax_vars = {
        "params": converted["params"]["resnet_conv"],
        "batch_stats": converted["batch_stats"]["resnet_conv"],
    }
    return t, model, flax_vars, report


def test_structure_full_conversion(trunk_pair):
    """Every torch tensor lands in the flax tree (no unmatched keys) and
    every non-tracked key is consumed."""
    t, _, _, report = trunk_pair
    assert report["unmatched"] == []
    assert all(k.endswith("num_batches_tracked") for k in report["skipped"]), (
        report["skipped"][:5]
    )
    n_torch = sum(p.numel() for p in t.parameters())
    assert n_torch == 42_500_160  # torchvision resnet101 trunk parameter count


def test_forward_parity(trunk_pair, rng):
    t, model, variables, _ = trunk_pair
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    assert got.shape == want.shape == (2, 2, 2, 2048)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_attentive_cnn_resnet_backend(rng):
    """AttentiveCNN(eff_flag=False) runs the trunk at 224² and projects to
    the 1024-ch latent contract (reference's branch crashes as shipped —
    conv_a undefined; see models/efficientnet.py docstring)."""
    from ssunet_gan_tpu.models.efficientnet import AttentiveCNN

    model = AttentiveCNN(eff_flag=False)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 7, 7, 1024)
