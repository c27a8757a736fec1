"""Parity tests for the Pallas block-fused SPADE kernel.

The fused path must be numerically interchangeable with the XLA SPADE
(`ops/spade.py` unfused branch), which itself is parity-tested against the
torch reference (tests/test_models.py). On CPU the kernels run in Pallas
interpret mode, so these tests exercise the exact kernel bodies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.spade_kernel import (
    fused_spade_apply,
    im2col_3x3,
    set_fused_spade,
)
def _init(mod, key, *args):
    return jax.jit(lambda k: mod.init(k, *args))(key)


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    set_fused_spade(None)


def _conv3(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


def _make_case(rng, n, h, w, c, nh, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), dtype)
    a = jnp.asarray(rng.normal(size=(n, h, w, nh)), dtype)
    kg = jnp.asarray(rng.normal(size=(3, 3, nh, c)) * 0.2, jnp.float32)
    bg = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(3, 3, nh, c)) * 0.2, jnp.float32)
    bb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, a, kg, bg, kb, bb


def _reference(x, a, kg, bg, kb, bb):
    gamma = _conv3(a, kg, bg)
    beta = _conv3(a, kb, bb)
    return x * (1 + gamma) + beta


@pytest.mark.parametrize(
    "n,h,w,c,nh",
    [(2, 8, 8, 16, 4), (1, 16, 16, 64, 4), (2, 4, 4, 32, 8), (1, 8, 8, 48, 24)],
)
def test_forward_parity(rng, n, h, w, c, nh):
    case = _make_case(rng, n, h, w, c, nh)
    got = fused_spade_apply(*case)
    want = _reference(*case)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_grad_parity(rng):
    case = _make_case(rng, 2, 8, 8, 16, 4)
    cot = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)

    def loss_fused(*args):
        return jnp.sum(fused_spade_apply(*args) * cot)

    def loss_ref(*args):
        return jnp.sum(_reference(*args) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*case)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*case)
    for gf, gr, name in zip(g_fused, g_ref, ["x", "a", "kg", "bg", "kb", "bb"]):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_bf16_smoke(rng):
    case = _make_case(rng, 1, 8, 8, 32, 4, dtype=jnp.bfloat16)
    got = fused_spade_apply(*case).astype(jnp.float32)
    want = _reference(
        case[0].astype(jnp.float32), case[1].astype(jnp.float32), *case[2:]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0.05, atol=0.1)
    assert got.dtype == jnp.float32  # cast above; kernel output was bf16


def test_im2col_matches_conv(rng):
    a = jnp.asarray(rng.normal(size=(2, 6, 6, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        a, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = im2col_3x3(a).reshape(-1, 36) @ k.reshape(36, 8)
    np.testing.assert_allclose(
        np.asarray(got.reshape(want.shape)), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_spade_module_fused_vs_unfused(rng):
    """The SPADE flax module produces identical outputs (and one param tree)
    with the kernel on and off — self-SPADE configuration as in the models."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    mod = SPADE("spadebatch3x3", 64, 3, 64 / 16.0)

    set_fused_spade(False)
    variables = _init(mod, jax.random.PRNGKey(0), x, x)
    want = mod.apply(variables, x, x)

    set_fused_spade(True)
    variables2 = _init(mod, jax.random.PRNGKey(0), x, x)
    got = mod.apply(variables2, x, x)

    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(variables2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
