"""Test configuration.

Tests run on a virtual 8-device CPU backend (the JAX-native way to exercise
mesh/sharding code without TPU hardware — SURVEY.md §4).  Env vars must be
set before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

import numpy as np
import pytest

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend through
# jax.config before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_SCRIPTS = "/root/reference/scripts"
HAS_REFERENCE = os.path.isdir(REFERENCE_SCRIPTS)

requires_reference = pytest.mark.skipif(
    not HAS_REFERENCE, reason="reference repo not mounted at /root/reference"
)


@pytest.fixture(scope="session")
def reference_path():
    """Put the reference's scripts dir on sys.path so its torch modules can
    be imported as a parity oracle (we never copy its code — we import and
    compare against it)."""
    if REFERENCE_SCRIPTS not in sys.path:
        sys.path.insert(0, REFERENCE_SCRIPTS)
    # torchvision isn't installed; the reference's archs.py imports it at
    # module level but only uses it inside AttentiveCNN's resnet branch.
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    return REFERENCE_SCRIPTS


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
