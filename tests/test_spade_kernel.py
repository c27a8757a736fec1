"""Parity tests for the Pallas fused SPADE stage kernel.

The fused self-SPADE stage must be numerically interchangeable with the XLA
composition (`_xla_self_spade`), which mirrors the torch reference that
tests/test_models.py validates. On CPU the kernel runs in Pallas interpret
mode, so these tests exercise the exact kernel body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.spade_kernel import (
    _xla_self_spade,
    fast_gamma_beta_modulate,
    fused_spade_stage,
    im2col_3x3,
    set_fused_spade,
)


def _init(mod, key, *args):
    return jax.jit(lambda k: mod.init(k, *args))(key)


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    set_fused_spade(None)


def _make_case(rng, n, h, w, c, lab, nh, dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)), dtype)
    k1 = jnp.asarray(rng.normal(size=(3, 3, c, lab)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(lab,)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, lab, nh)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(nh,)) * 0.1, jnp.float32)
    kg = jnp.asarray(rng.normal(size=(3, 3, nh, c)) * 0.2, jnp.float32)
    bg = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(3, 3, nh, c)) * 0.2, jnp.float32)
    bb = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, k1, b1, k2, b2, kg, bg, kb, bb


@pytest.mark.parametrize(
    "n,h,w,c,lab,nh",
    [
        (2, 8, 8, 16, 3, 4),     # tiny, single band
        (1, 16, 16, 64, 3, 4),   # flagship level-0 ratios, TH=16 path
        (2, 24, 16, 32, 3, 8),   # H%16!=0 → TH=8 path, several bands
        (1, 8, 32, 48, 2, 24),   # non-3 label count, wide nh
    ],
)
def test_stage_forward_parity(rng, n, h, w, c, lab, nh):
    case = _make_case(rng, n, h, w, c, lab, nh)
    got = fused_spade_stage(*case)
    want = _xla_self_spade(*case)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_stage_grad_parity(rng):
    case = _make_case(rng, 2, 16, 8, 16, 3, 4)
    cot = jnp.asarray(rng.normal(size=(2, 16, 8, 16)), jnp.float32)

    def loss_fused(*args):
        return jnp.sum(fused_spade_stage(*args) * cot)

    def loss_ref(*args):
        return jnp.sum(_xla_self_spade(*args) * cot)

    argnums = tuple(range(9))
    g_fused = jax.grad(loss_fused, argnums=argnums)(*case)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*case)
    names = ["x", "k1", "b1", "k2", "b2", "kg", "bg", "kb", "bb"]
    for gf, gr, name in zip(g_fused, g_ref, names):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_stage_bf16_smoke(rng):
    case = _make_case(rng, 1, 8, 16, 32, 3, 4, dtype=jnp.bfloat16)
    got = np.asarray(fused_spade_stage(*case), np.float32)
    want = np.asarray(
        _xla_self_spade(case[0].astype(jnp.float32), *case[1:]), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.15)


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


def test_fast_gamma_beta_modulate_parity(rng):
    """"fast" mode's im2col + wide 1×1 conv equals the two narrow convs."""
    case = _make_case(rng, 2, 8, 8, 32, 3, 4)
    x, _, _, _, _, kg, bg, kb, bb = case
    actv = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)

    def conv3(v, k, b):
        y = jax.lax.conv_general_dilated(
            v, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + b

    want = x * (1 + conv3(actv, kg, bg)) + conv3(actv, kb, bb)
    got = fast_gamma_beta_modulate(x, actv, kg, bg, kb, bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # and it is differentiable with matching grads
    g1 = jax.grad(lambda a: jnp.sum(fast_gamma_beta_modulate(x, a, kg, bg, kb, bb) ** 2))(actv)
    g2 = jax.grad(lambda a: jnp.sum((x * (1 + conv3(a, kg, bg)) + conv3(a, kb, bb)) ** 2))(actv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", [True, "pallas"])
def test_spade_module_fused_vs_unfused(rng, mode):
    """The SPADE flax module produces identical outputs (and one param tree)
    across all modes — self-SPADE configuration as in the models."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)), jnp.float32)
    mod = SPADE("spadebatch3x3", 64, 3, 64 / 16.0)

    set_fused_spade(False)
    variables = _init(mod, jax.random.PRNGKey(0), x, x)
    want = mod.apply(variables, x, x)

    set_fused_spade(mode)
    variables2 = _init(mod, jax.random.PRNGKey(0), x, x)
    got = mod.apply(variables2, x, x)

    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(variables2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_spade_module_general_segmap(rng):
    """Non-self SPADE (segmap != x, e.g. SPADEResnetBlock): the Pallas stage
    kernel must NOT engage (it assumes self-conditioning), but the "fast"
    γ/β restructuring applies and stays numerically equivalent."""
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)), jnp.float32)
    seg = jnp.asarray(rng.normal(size=(1, 8, 8, 5)), jnp.float32)
    mod = SPADE("spadebatch3x3", 16, 3, 4.0)
    variables = _init(mod, jax.random.PRNGKey(0), x, seg)

    set_fused_spade(False)
    want = mod.apply(variables, x, seg)
    for mode in (True, "pallas"):
        set_fused_spade(mode)
        got = mod.apply(variables, x, seg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5, err_msg=str(mode)
        )
