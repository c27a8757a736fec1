"""Parity tests for the training-mode fused stage (ops/stage_kernel_train.py).

CPU runs the kernels in Pallas interpret mode. Bars: forward parity with the
XLA train composition, batch-stat parity (they feed running averages), and
gradient parity ≤ 1e-3 rel in f32 (the VERDICT r2 #2 acceptance bar).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.blocks import BasicBlock
from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.stage_kernel_train import (
    _xla_train_stage,
    fused_train_stage,
    set_fused_train,
)
from ssunet_gan_tpu.utils import jit_init

from tests.test_stage_kernel import _init_pair


@pytest.fixture(autouse=True)
def _restore_flags():
    yield
    set_fused_train(None)


@pytest.fixture
def rng():
    return np.random.default_rng(31)


def _train_bundles(planes, label, shapes, nh, rng):
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label, shapes, nh)
    in_planes = sum(s[-1] for s in shapes)
    bp = BasicBlock(block.planes, in_planes=in_planes).apply(bvars, None, True)
    sp = spade.apply(svars, None, None)
    return bp, sp, parts


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(2, 16, 16, 8)], 4.0),
        (16, 3, [(1, 16, 16, 8), (1, 16, 16, 16)], 4.0),
        (32, 2, [(2, 24, 16, 16)], 8.0),
    ],
)
def test_train_stage_forward_and_stats_parity(rng, planes, label, shapes, nh):
    from ssunet_gan_tpu.ops.wminor import to_nhwc

    bp, sp, parts = _train_bundles(planes, label, shapes, nh, rng)
    out, stats = fused_train_stage(parts, bp, sp, None)
    want_out, want_stats = _xla_train_stage(parts, bp, sp, None)
    np.testing.assert_allclose(
        np.asarray(to_nhwc(out)), np.asarray(want_out), rtol=2e-3, atol=2e-3
    )
    for (m, v), (wm, wv) in zip(stats, want_stats):
        np.testing.assert_allclose(np.asarray(m), np.asarray(wm), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(wv), rtol=1e-3,
                                   atol=1e-4)


def test_train_tail_halo_carry_bitexact(rng):
    """Opt-in halo carry in the train tail kernel (y/seg/actv rows carried
    from the previous band's scratch) is bit-exact vs the recompute form —
    forward outputs AND batch stats."""
    from ssunet_gan_tpu.ops.stage_kernel import set_halo_carry
    from ssunet_gan_tpu.ops.wminor import to_nhwc

    bp, sp, parts = _train_bundles(16, 3, [(1, 64, 8, 8)], 4.0, rng)
    try:
        set_halo_carry(False)
        out_off, stats_off = fused_train_stage(parts, bp, sp, None)
        set_halo_carry(True)
        out_on, stats_on = fused_train_stage(parts, bp, sp, None)
    finally:
        set_halo_carry(None)
    np.testing.assert_array_equal(
        np.asarray(to_nhwc(out_on)), np.asarray(to_nhwc(out_off))
    )
    for (m, v), (wm, wv) in zip(stats_on, stats_off):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(wm))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))


def test_train_stage_wminor_parts_roundtrip(rng):
    """WTensor parts in → WTensor out, same math as NHWC parts."""
    from ssunet_gan_tpu.ops.acts import WTensor
    from ssunet_gan_tpu.ops.wminor import to_nhwc

    bp, sp, parts = _train_bundles(16, 3, [(1, 16, 16, 8), (1, 16, 16, 16)],
                                   4.0, rng)
    out_ref, stats_ref = fused_train_stage(parts, bp, sp, None)
    wparts = tuple(WTensor(jnp.swapaxes(p, 2, 3)) for p in parts)
    out, stats = fused_train_stage(wparts, bp, sp, None)
    assert isinstance(out, WTensor)
    np.testing.assert_allclose(
        np.asarray(to_nhwc(out)), np.asarray(to_nhwc(out_ref)), rtol=0, atol=0
    )
    for (m, v), (wm, wv) in zip(stats, stats_ref):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(wm))


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(1, 16, 16, 8)], 4.0),
        (16, 3, [(1, 16, 16, 8), (1, 16, 16, 16)], 4.0),  # split-concat
    ],
)
def test_train_stage_gradient_parity(rng, planes, label, shapes, nh):
    """Grads of the fused stage vs the XLA composition, f32, ≤1e-3 rel."""
    from ssunet_gan_tpu.ops.wminor import to_nhwc

    bp, sp, parts = _train_bundles(planes, label, shapes, nh, rng)
    cot = jnp.asarray(
        rng.normal(size=(shapes[0][0], shapes[0][1], shapes[0][2], planes))
        .astype(np.float32)
    )

    def loss_fused(parts, bp, sp):
        out, _ = fused_train_stage(parts, bp, sp, None)
        return jnp.sum(to_nhwc(out) * cot)

    def loss_ref(parts, bp, sp):
        out, _ = _xla_train_stage(parts, bp, sp, None)
        return jnp.sum(out * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(parts, bp, sp)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(parts, bp, sp)

    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-6
        rel = np.abs(a - b).max() / denom
        assert rel < 1e-3, rel


def test_train_stage_gradient_parity_folded_head(rng):
    """Grad parity with the final 1×1 head folded (analytic head backward
    + γ/β recompute path)."""
    bp, sp, parts = _train_bundles(16, 3, [(1, 16, 16, 8)], 4.0, rng)
    ncls = 3
    kf = jnp.asarray(rng.normal(size=(1, 1, 16, ncls)).astype(np.float32))
    bf = jnp.asarray(rng.normal(size=(ncls,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(1, 16, 16, ncls)).astype(np.float32))

    def loss(fn):
        def run(parts, bp, sp, head):
            out, _ = fn(parts, bp, sp, head)
            return jnp.sum(out * cot)
        return run

    g_fused = jax.grad(loss(fused_train_stage), argnums=(0, 1, 2, 3))(
        parts, bp, sp, (kf, bf)
    )
    g_ref = jax.grad(loss(_xla_train_stage), argnums=(0, 1, 2, 3))(
        parts, bp, sp, (kf, bf)
    )
    flat_f = jax.tree_util.tree_leaves(g_fused)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
        assert rel < 1e-3, rel


@pytest.mark.parametrize(
    "n,h,w,cps,c",
    [(2, 16, 8, (8,), 16), (1, 24, 16, (8, 4), 8), (2, 16, 8, (16,), 32)],
)
def test_conv3_wgrad_kernel_parity(rng, n, h, w, cps, c):
    """The weight-grad Pallas kernel vs jax.linear_transpose of conv3."""
    from ssunet_gan_tpu.ops.stage_kernel_train import _conv3, _conv3_wgrad

    parts = [
        jnp.asarray(rng.normal(size=(n, h, w, cp)).astype(np.float32))
        for cp in cps
    ]
    g = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    got = _conv3_wgrad(parts, g)
    k0 = jnp.zeros((3, 3, sum(cps), c), jnp.float32)
    want = jax.linear_transpose(lambda k: _conv3(list(parts), k), k0)(g)[0]
    # f32 accumulation-order differences across ~n·h·w terms: loose atol
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_flagship_train_forward_fused_matches_composition(rng):
    """Flagship train-mode forward + batch_stats updates: fused vs XLA."""
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)

    set_fused_train(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=True)
    want, wmut = model.apply(variables, x, True, mutable=["batch_stats"])

    set_fused_train(True)
    variables2 = jit_init(model, jax.random.PRNGKey(0), x, train=True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    got, gmut = model.apply(variables, x, True, mutable=["batch_stats"])

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-3
    )
    by_path = lambda kv: str(kv[0])
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(wmut["batch_stats"]), key=by_path),
        sorted(jax.tree_util.tree_leaves_with_path(gmut["batch_stats"]), key=by_path),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.slow
def test_train_step_parity_fused(rng):
    """One full supervised train step (loss+grads+Adam+clamp) fused vs XLA."""
    from ssunet_gan_tpu.ops.losses import bce_dice_loss
    from ssunet_gan_tpu.train.optim import build_optimizer
    from ssunet_gan_tpu.train.state import TrainState
    from ssunet_gan_tpu.train.step import make_train_step

    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 32, 32, 3)) > 0.5).astype(np.float32))
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-7})

    def run(fused):
        set_fused_train(fused)
        variables = jit_init(model, jax.random.PRNGKey(0), x, train=True)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, bce_dice_loss, tx, 3, clip=0.7)
        state, metrics = step(state, (x, y), jnp.float32(1e-3))
        return float(metrics["loss"]), state

    loss_ref, state_ref = run(False)
    loss_fused, state_fused = run(True)
    assert abs(loss_fused - loss_ref) < 2e-3, (loss_fused, loss_ref)
    la = jax.tree_util.tree_leaves(state_ref.params)
    lb = jax.tree_util.tree_leaves(state_fused.params)
    worst = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(la, lb)
    )
    assert worst < 5e-3, worst

@pytest.mark.slow
def test_train_lookahead_grid_matches_prologue(rng):
    """The lookahead grid in the train kernels (1-row scratch + 8-row
    next-band view, no prologue step) is bit-exact vs the prologue grid:
    forward outputs, batch stats AND gradients."""
    from ssunet_gan_tpu.ops.stage_kernel import set_lookahead
    from ssunet_gan_tpu.ops.wminor import to_nhwc

    shapes = [(1, 64, 16, 8), (1, 64, 16, 16)]  # multi-band, split-concat
    bp, sp, parts = _train_bundles(16, 3, shapes, 4.0, rng)
    cot = jnp.asarray(
        rng.normal(size=(1, 64, 16, 16)).astype(np.float32)
    )

    def run(parts, bp, sp):
        out, stats = fused_train_stage(parts, bp, sp, None)
        return jnp.sum(to_nhwc(out) * cot), (to_nhwc(out), stats)

    try:
        set_lookahead(False)
        (_, (out_a, st_a)), g_a = jax.value_and_grad(
            run, argnums=(0, 1, 2), has_aux=True)(parts, bp, sp)
        set_lookahead(True)
        (_, (out_b, st_b)), g_b = jax.value_and_grad(
            run, argnums=(0, 1, 2), has_aux=True)(parts, bp, sp)
    finally:
        set_lookahead(None)

    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_a))
    for (m, v), (wm, wv) in zip(st_b, st_a):
        np.testing.assert_array_equal(np.asarray(m), np.asarray(wm))
        np.testing.assert_array_equal(np.asarray(v), np.asarray(wv))
    # grads: the two grids compile different programs, so the XLA-side
    # backward reductions may re-associate — tight parity, not bit-exact
    flat_a, _ = jax.tree_util.tree_flatten(g_a)
    flat_b, _ = jax.tree_util.tree_flatten(g_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        assert rel < 1e-5, rel
