"""Parity tests for the fused eval [BasicBlock + self-SPADE] stage kernel.

On CPU the kernel runs in Pallas interpret mode, exercising the exact
kernel body against the standard module composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.blocks import BasicBlock
from ssunet_gan_tpu.ops.spade import SPADE
from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade
from ssunet_gan_tpu.ops.stage_kernel import (
    fused_eval_stage,
    set_fused_stage,
)
from ssunet_gan_tpu.utils import jit_init


@pytest.fixture(autouse=True)
def _restore_flags():
    yield
    set_fused_stage(None)
    set_fused_spade(None)


def _make_stage_modules(planes, label_nc, nhidden):
    block = BasicBlock(planes)
    spade = SPADE("spadebatch3x3", planes, label_nc, nhidden)
    return block, spade


def _reference_stage(block, spade, bvars, svars, parts):
    y = block.apply(bvars, parts if len(parts) > 1 else parts[0], False)
    return spade.apply(svars, y, y)


def _fused_stage(block, spade, bvars, svars, parts, in_planes):
    bp = BasicBlock(block.planes, in_planes=in_planes).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    return fused_eval_stage(parts, bp, sp)


def _init_pair(rng, planes, label_nc, shapes, nhidden):
    block, spade = _make_stage_modules(planes, label_nc, nhidden)
    parts = tuple(
        jnp.asarray(rng.normal(size=s), jnp.float32) for s in shapes
    )
    xin = parts if len(parts) > 1 else parts[0]
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(0), xin, True))()
    y0 = jnp.zeros(shapes[0][:3] + (planes,), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(1), y0, y0))()
    # randomize BN running stats so the eval affine actually matters
    g = np.random.default_rng(7)

    def _randomize(node):
        if isinstance(node, dict):
            return {
                k: (
                    jnp.asarray((g.random(v.shape) + 0.5).astype(np.float32))
                    if k == "var"
                    else jnp.asarray(g.normal(size=v.shape).astype(np.float32) * 0.3)
                    if k == "mean"
                    else _randomize(v)
                )
                for k, v in node.items()
            }
        return node

    bvars = {"params": bvars["params"], "batch_stats": _randomize(dict(bvars["batch_stats"]))}
    return block, spade, bvars, svars, parts


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(2, 16, 8, 8)], 4.0),                       # encoder, 1 part
        (16, 3, [(1, 8, 16, 8), (1, 8, 16, 16)], 4.0),       # decoder, 2 parts
        (32, 3, [(1, 24, 8, 16)], 2.0),                      # th=8 multi-band
        (8, 2, [(2, 8, 8, 3)], 4.0),                         # 3-ch first block
    ],
)
def test_stage_forward_parity(rng, planes, label, shapes, nh):
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label, shapes, nh)
    want = _reference_stage(block, spade, bvars, svars, parts)
    got = _fused_stage(block, spade, bvars, svars, parts,
                       sum(s[-1] for s in shapes))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_stage_bf16_smoke(rng):
    block, spade, bvars, svars, parts = _init_pair(rng, 16, 3, [(1, 8, 8, 8)], 4.0)
    parts16 = tuple(p.astype(jnp.bfloat16) for p in parts)
    got = np.asarray(
        _fused_stage(block, spade, bvars, svars, parts16, 8), np.float32
    )
    want = np.asarray(_reference_stage(block, spade, bvars, svars, parts), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.3)


def test_flagship_fused_stage_model_parity(rng):
    """Flagship eval forward: fused-stage mode vs standard composition."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, False)

    set_fused_stage(True)
    variables2 = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    got = model.apply(variables2, x, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )

    # train-mode forward must take the XLA path and stay untouched
    t1 = model.apply(variables, x, True, mutable=["batch_stats"])[0]
    set_fused_stage(False)
    t2 = model.apply(variables, x, True, mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_unet_r_ss_fused_stage_model_parity(rng):
    """UNet_R_SS (non-v2 sibling) eval forward: fused vs composition."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, False)

    set_fused_stage(True)
    variables2 = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    got = model.apply(variables2, x, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_probe_gate_falls_back_cleanly(rng, monkeypatch):
    """A shape in the uncertain VMEM band whose probe-compile fails must
    route the stage to the XLA composition, not crash (r2 VERDICT weak #6:
    the old guard-band heuristic turned this into a Mosaic compile crash)."""
    from ssunet_gan_tpu.ops import stage_kernel

    calls = []

    def failing_probe(*args, **kwargs):
        calls.append(args)
        return False

    # force every shape into the probe tier, and make the probe "fail"
    monkeypatch.setattr(stage_kernel, "_TRUST_BYTES", 0)
    monkeypatch.setattr(stage_kernel, "_probe_compile", failing_probe)
    monkeypatch.setattr(stage_kernel, "_TH_CACHE", {})

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, False)

    set_fused_stage(True)  # enabled, but every probe fails → XLA path
    got = model.apply(variables, x, False)
    assert calls, "probe tier was never consulted"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_probe_verdicts_are_cached(rng, monkeypatch):
    from ssunet_gan_tpu.ops import stage_kernel

    calls = []
    monkeypatch.setattr(stage_kernel, "_TRUST_BYTES", 0)
    monkeypatch.setattr(
        stage_kernel, "_probe_compile", lambda *a, **k: calls.append(a) or True
    )
    monkeypatch.setattr(stage_kernel, "_TH_CACHE", {})

    parts = (jnp.zeros((1, 16, 16, 8), jnp.float32),)
    for _ in range(3):
        assert stage_kernel.fused_stage_probe_ok(parts, 16, 3, 4)
    assert len(calls) == 1


@pytest.mark.slow
def test_ssunet_fused_stage_model_parity(rng):
    """SSUNet (VGGBlock stages, zero-shortcut fused packing) eval forward:
    fused vs composition."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("SSUNet", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, False)

    set_fused_stage(True)
    variables2 = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    got = model.apply(variables2, x, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


@pytest.mark.slow
def test_unet_b_ss_fused_stage_model_parity(rng):
    """UNet_B_SS (Bottleneck stages) eval forward: fused vs composition."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_B_SS", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = model.apply(variables, x, False)

    set_fused_stage(True)
    variables2 = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(
        variables2
    )
    got = model.apply(variables2, x, False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


def test_bneck_identity_shortcut_stage_parity(rng):
    """Bottleneck fused stage with an identity shortcut (in == planes)."""
    from ssunet_gan_tpu.ops.blocks import Bottleneck
    from ssunet_gan_tpu.ops.stage_kernel import fused_eval_stage_bneck

    planes = 16
    x = jnp.asarray(rng.normal(size=(1, 16, 16, planes)).astype(np.float32))
    block = Bottleneck(planes, in_planes=planes)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), x, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), x, x))()

    y = block.apply(bvars, x, False)
    want = spade.apply(svars, y, y)
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    got = fused_eval_stage_bneck((x,), bp, sp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Deep-level lane packing (f images side by side on the lane axis).
# _PACK_W is monkeypatched down so interpret-mode shapes trigger packing;
# parity vs the module composition also proves the seam masking (a leaked
# W-shift across an image seam would corrupt border columns).
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip(rng):
    from ssunet_gan_tpu.ops.stage_kernel import _pack_lanes, _unpack_lanes

    x = jnp.asarray(rng.normal(size=(4, 8, 16, 8)).astype(np.float32))
    assert np.array_equal(np.asarray(_unpack_lanes(_pack_lanes(x, 4), 4)),
                          np.asarray(x))
    # image j of each group lands contiguously at lanes [j·W, (j+1)·W)
    p = _pack_lanes(x, 4)
    np.testing.assert_array_equal(np.asarray(p[0, :, :, 8:16]),
                                  np.asarray(x[1]))


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(4, 16, 8, 8)], 4.0),                     # encoder, f=2
        (16, 3, [(4, 8, 8, 8), (4, 8, 8, 16)], 4.0),       # decoder, f=2
        (16, 3, [(8, 8, 4, 8)], 4.0),                      # f=4, tiny W
    ],
)
def test_stage_forward_parity_lane_packed(rng, monkeypatch, planes, label,
                                          shapes, nh):
    from ssunet_gan_tpu.ops import stage_kernel

    monkeypatch.setattr(stage_kernel, "_PACK_W", 16)
    assert stage_kernel._pack_factor(shapes[0][0], shapes[0][2]) > 1
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label, shapes, nh)
    want = _reference_stage(block, spade, bvars, svars, parts)
    got = _fused_stage(block, spade, bvars, svars, parts,
                       sum(s[-1] for s in shapes))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_bneck_stage_parity_lane_packed(rng, monkeypatch):
    from ssunet_gan_tpu.ops import stage_kernel
    from ssunet_gan_tpu.ops.blocks import Bottleneck
    from ssunet_gan_tpu.ops.stage_kernel import fused_eval_stage_bneck

    monkeypatch.setattr(stage_kernel, "_PACK_W", 16)
    planes, cin = 16, 8
    x = jnp.asarray(rng.normal(size=(4, 16, 8, cin)).astype(np.float32))
    block = Bottleneck(planes, in_planes=cin)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), x, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    y0 = jnp.zeros(x.shape[:3] + (planes,), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), y0, y0))()

    y = block.apply(bvars, x, False)
    want = spade.apply(svars, y, y)
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    got = fused_eval_stage_bneck((x,), bp, sp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_int8_stage_lane_packed(rng, monkeypatch):
    from ssunet_gan_tpu.ops import stage_kernel
    from ssunet_gan_tpu.ops.stage_kernel_int8 import fused_eval_stage_int8

    monkeypatch.setattr(stage_kernel, "_PACK_W", 16)
    shapes = [(4, 16, 8, 8)]
    block, spade, bvars, svars, parts = _init_pair(rng, 16, 3, shapes, 4.0)
    want = np.asarray(_reference_stage(block, spade, bvars, svars, parts))
    bp = BasicBlock(block.planes, in_planes=8).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    got = np.asarray(fused_eval_stage_int8(parts, bp, sp))
    assert np.isfinite(got).all()
    scale = np.abs(want).max() + 1e-6
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rms < 0.02, f"relative RMS {rms:.4f}"


# ---------------------------------------------------------------------------
# Stacked seg-conv dots (spade_kernel.pack_seg_stacked): the x2map conv
# computed r rows per block-diagonal MXU dot instead of per-row M=lab dots.
# Same math up to f32 accumulation order — parity vs the module composition
# with the flag on covers the packing, the rhs window assembly, and the
# (t, 8, W) reshape/slice.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(2, 16, 8, 8)], 4.0),                   # encoder, 1 part
        (16, 3, [(1, 8, 16, 8), (1, 8, 16, 16)], 4.0),   # decoder, 2 parts
        (32, 5, [(1, 24, 8, 16)], 2.0),                  # lab > 3, multi-band
    ],
)
def test_stage_forward_parity_seg_stacked(rng, planes, label, shapes, nh):
    from ssunet_gan_tpu.ops.stage_kernel import set_seg_stack

    block, spade, bvars, svars, parts = _init_pair(rng, planes, label,
                                                   shapes, nh)
    want = _reference_stage(block, spade, bvars, svars, parts)
    set_seg_stack(True)
    try:
        got = _fused_stage(block, spade, bvars, svars, parts,
                           sum(s[-1] for s in shapes))
    finally:
        set_seg_stack(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Halo carry (spade_kernel._carried_rows): the per-band h1/y/seg/actv halo
# rows come from the previous band's scratch instead of being recomputed.
# Bit-exact by construction — the ON/OFF equivalence below pins that, over
# shapes with several bands per image (where carries actually flow) and
# both edge bands (where the seed + masking interact).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(1, 64, 8, 8)], 4.0),                   # th=32, 2 bands
        (16, 3, [(1, 24, 8, 8), (1, 24, 8, 16)], 4.0),   # 3 bands, 2 parts
    ],
)
@pytest.mark.slow
def test_halo_carry_matches_recompute(rng, planes, label, shapes, nh):
    from ssunet_gan_tpu.ops.stage_kernel import set_halo_carry

    block, spade, bvars, svars, parts = _init_pair(rng, planes, label,
                                                   shapes, nh)
    cin = sum(s[-1] for s in shapes)
    try:
        set_halo_carry(False)
        want = _fused_stage(block, spade, bvars, svars, parts, cin)
        set_halo_carry(True)
        got = _fused_stage(block, spade, bvars, svars, parts, cin)
    finally:
        set_halo_carry(None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    ref = _reference_stage(block, spade, bvars, svars, parts)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_bneck_stage_parity_seg_stacked(rng):
    from ssunet_gan_tpu.ops.blocks import Bottleneck
    from ssunet_gan_tpu.ops.stage_kernel import (
        fused_eval_stage_bneck,
        set_seg_stack,
    )

    planes = 16
    x = jnp.asarray(rng.normal(size=(1, 16, 16, planes)).astype(np.float32))
    block = Bottleneck(planes, in_planes=planes)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), x, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), x, x))()

    y = block.apply(bvars, x, False)
    want = spade.apply(svars, y, y)
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    set_seg_stack(True)
    try:
        got = fused_eval_stage_bneck((x,), bp, sp)
    finally:
        set_seg_stack(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(1, 64, 8, 8)], 4.0),                   # multi-band
        (16, 3, [(1, 24, 8, 8), (1, 24, 8, 16)], 4.0),   # 3 bands, 2 parts
    ],
)
def test_lookahead_grid_matches_prologue(rng, planes, label, shapes, nh):
    """The lookahead grid (no per-image prologue step, 5-row scratch,
    8-row next-band lookahead spec) is bit-exact vs the prologue grid —
    measured +3.5% end-to-end bf16 (BASELINE.md r3)."""
    from ssunet_gan_tpu.ops.stage_kernel import set_lookahead

    block, spade, bvars, svars, parts = _init_pair(rng, planes, label,
                                                   shapes, nh)
    cin = sum(s[-1] for s in shapes)
    try:
        set_lookahead(False)
        want = _fused_stage(block, spade, bvars, svars, parts, cin)
        set_lookahead(True)
        got = _fused_stage(block, spade, bvars, svars, parts, cin)
    finally:
        set_lookahead(None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    ref = _reference_stage(block, spade, bvars, svars, parts)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_lookahead_model_parity(rng):
    """Full-model check of the lookahead grid (covers the folded final
    conv and the W-minor seams between lookahead kernels)."""
    from ssunet_gan_tpu.ops.stage_kernel import set_lookahead

    model = build_model("SSUNet", num_classes=2, input_channels=3)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)

    set_fused_stage(True)
    try:
        set_lookahead(False)
        want = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
        set_lookahead(True)
        got = jax.jit(lambda v, x: model.apply(v, x, False))(variables, x)
    finally:
        set_lookahead(None)
        set_fused_stage(None)
    # bias-tile mode adds the bias POST-dot; XLA may FMA-fuse that add
    # differently per grid program, so the model-level pin allows f32
    # ulp-level drift (the direct-kernel grid pins stay bit-exact)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-6)

def test_bneck_lookahead_grid_matches_prologue(rng):
    """The bneck variant of the lookahead grid (4-row scratch + 4-row
    next-band view, grid (n, nh)) is bit-exact vs the prologue grid."""
    from ssunet_gan_tpu.ops.blocks import Bottleneck
    from ssunet_gan_tpu.ops.stage_kernel import (
        fused_eval_stage_bneck,
        set_lookahead,
    )

    planes, cin = 16, 8
    x = jnp.asarray(rng.normal(size=(1, 24, 16, cin)).astype(np.float32))
    block = Bottleneck(planes, in_planes=cin)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), x, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    y0 = jnp.zeros(x.shape[:3] + (planes,), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), y0, y0))()
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)

    try:
        set_lookahead(False)
        want = fused_eval_stage_bneck((x,), bp, sp)
        set_lookahead(True)
        got = fused_eval_stage_bneck((x,), bp, sp)
    finally:
        set_lookahead(None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    y = block.apply(bvars, x, False)
    ref = spade.apply(svars, y, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# Lazy upsample (upsample-on-read): the decoder's 2× bilinear H-interp runs
# inside the consuming kernel from half-res row bands (ops/acts.UpTensor).
# ---------------------------------------------------------------------------


def test_up_weights_exact_all_model_sizes():
    """The kernel's integer-ratio f32 weight formula must reproduce the
    f64-derived einsum weights bit-exactly after bf16 rounding for every
    half-height the model families produce (guard: ops/acts)."""
    from ssunet_gan_tpu.ops.acts import up_weights_exact

    for hh in (4, 8, 16, 32, 64, 128, 256, 512):
        assert up_weights_exact(hh), hh


def test_lazy_upsample_stage_call_bit_exact_bf16(rng):
    """Direct _stage_call: a half-H part expanded on read must match the
    same call on the materialized full part — bit-exact in bf16 (the
    weights and the 2-term f32 lerp equal the H-einsum's numerics)."""
    from ssunet_gan_tpu.ops import stage_kernel as sk
    from ssunet_gan_tpu.ops.acts import UpTensor, materialize_up

    n, h, w, c = 2, 32, 16, 8
    cp0, cp1 = 4, 8
    lab, nh_ = 3, 4

    def arr(*s):
        return jnp.asarray(rng.normal(size=s).astype(np.float32))

    for dtype, exact in ((jnp.bfloat16, True), (jnp.float32, False)):
        skip = arr(n, h, cp0, w).astype(dtype)
        half = arr(n, h // 2, cp1, w).astype(dtype)
        full = materialize_up(UpTensor(half))
        K1cat = arr(c, 9 * (cp0 + cp1) + 1).astype(dtype)
        K2SC = arr(c, 9 * c + (cp0 + cp1) + 1).astype(dtype)
        K1s = arr(lab, 9 * c + 1).astype(dtype)
        K2s = arr(nh_, 9 * lab + 1).astype(dtype)
        K3s = arr(2 * c, 9 * nh_ + 1).astype(dtype)
        got = sk._stage_call([skip, half], K1cat, K2SC, K1s, K2s, K3s, 16,
                             up=(False, True))
        want = sk._stage_call([skip, full.v], K1cat, K2SC, K1s, K2s, K3s, 16)
        a = np.asarray(got.astype(jnp.float32))
        b = np.asarray(want.astype(jnp.float32))
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            # f32 weights differ from the f64-derived matrix by ≤1 ulp and
            # the lerp reassociates the einsum — magnitude-scaled tolerance
            np.testing.assert_allclose(a, b, atol=3e-6 * np.abs(b).max())


@pytest.mark.slow
def test_lazy_upsample_model_parity(rng):
    """Flagship eval forward with lazy upsample seams vs the default fused
    path, plus fallbacks: train-mode and composition consumers must
    materialize transparently.

    The lazy form only engages for bf16 W-minor activations (upsample2x
    gate), so the fused A/B runs in bf16 — on the f32 CPU path lazy ON/OFF
    trace the identical graph and the test would be vacuous (r4 advisor
    finding). Conv2d casts its f32 params to the input dtype, so a bf16
    input is the bench's bf16 eval regime."""
    from ssunet_gan_tpu.ops.acts import UpTensor
    from ssunet_gan_tpu.ops.wminor import (
        WTensor,
        set_lazy_upsample,
        upsample2x,
    )

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)

    # gating sanity: a bf16 W-minor tensor (model half-heights are
    # weight-exact) must actually produce the lazy form
    probe = upsample2x(WTensor(jnp.zeros((1, 16, 8, 16), jnp.bfloat16)))
    assert isinstance(probe, UpTensor)
    assert not isinstance(
        upsample2x(WTensor(jnp.zeros((1, 16, 8, 16), jnp.float32))), UpTensor
    )

    xb = x.astype(jnp.bfloat16)
    set_fused_stage(True)
    try:
        set_lazy_upsample(False)
        want = model.apply(variables, xb, False)
        set_lazy_upsample(True)
        got = model.apply(variables, xb, False)
        # composition fallback (fused stages off) with lazy ON must
        # materialize via _dq / to_nhwc and still match the composition
        set_fused_stage(False)
        comp_lazy = model.apply(variables, x, False)
    finally:
        set_lazy_upsample(None)
    comp = model.apply(variables, x, False)
    # model-level lazy OFF lowers the seam H-then-W (einsum_hw) while the
    # lazy form is W-then-H — equal up to bf16 re-association (the
    # BIT-exact pin vs the same association is the direct _stage_call
    # test above); bound the drift through the downstream SPADE stages
    g = np.asarray(got.astype(jnp.float32))
    wv = np.asarray(want.astype(jnp.float32))
    np.testing.assert_allclose(g, wv, rtol=0, atol=0.08)
    assert np.mean(np.abs(g - wv)) < 5e-3
    np.testing.assert_array_equal(np.asarray(comp_lazy), np.asarray(comp))


# ---------------------------------------------------------------------------
# Pair-stacked dots (r5): the 2C ≤ 128 stages' conv1/conv2 run two output
# rows per MXU dot (2-row-block lhs over the 4-row tap window, bias as a
# pre-broadcast tile) — see ops/stage_kernel.set_pair_dots.
# ---------------------------------------------------------------------------


def test_pair_dots_matches_per_row(rng):
    """Pair mode is the per-row program's math two rows at a time: exact in
    f32 interpret (identical f32 dot accumulations + bias add), across
    single/split parts, UpTensor seams and the folded final head."""
    from ssunet_gan_tpu.ops import stage_kernel as sk
    from ssunet_gan_tpu.ops.acts import UpTensor, materialize_up
    from ssunet_gan_tpu.ops.blocks import BasicBlock
    from ssunet_gan_tpu.ops.spade import SPADE

    planes = 16
    n, h, w = 2, 32, 16
    cp0, cp1 = 8, 16
    skip = jnp.asarray(rng.normal(size=(n, h, w, cp0)).astype(np.float32))
    halfv = jnp.asarray(
        rng.normal(size=(n, h // 2, cp1, w)).astype(np.float32))
    upt = UpTensor(halfv)
    full = materialize_up(upt)
    xin = (skip, jnp.swapaxes(full.v, 2, 3))
    block = BasicBlock(planes, in_planes=cp0 + cp1)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), xin, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    y0 = jnp.zeros((n, h, w, planes), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), y0, y0))()
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    fh = (jnp.asarray(rng.normal(size=(1, 1, planes, 3)).astype(np.float32)),
          jnp.asarray(rng.normal(size=(3,)).astype(np.float32)))

    assert not sk.pair_dots_enabled(planes)   # auto OFF (measured negative)
    sk.set_pair_dots(True)
    try:
        assert sk.pair_dots_enabled(planes)    # opt-in at 2C <= 128
        assert not sk.pair_dots_enabled(128)   # 2C > 128 stays per-row
    finally:
        sk.set_pair_dots(None)
    for parts, head in (((skip, upt), fh), ((skip, full), None)):
        sk.set_pair_dots(False)
        want = sk.fused_eval_stage(parts, bp, sp, final_head=head)
        sk.set_pair_dots(True)
        got = sk.fused_eval_stage(parts, bp, sp, final_head=head)
        sk.set_pair_dots(None)
        # vs the (default) bias-tile per-row program: the pair dot's K is
        # 12·ΣCp with zero blocks — same math, different f32 association
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


@pytest.mark.slow
def test_pair_dots_bf16_model_smoke(rng):
    """Flagship bf16 eval forward, pair ON (default) vs OFF — the whole
    model through the pair kernels stays within bf16 tolerance of the
    per-row program."""
    from ssunet_gan_tpu.ops import stage_kernel as sk

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    xb = x.astype(jnp.bfloat16)
    set_fused_stage(True)
    try:
        sk.set_pair_dots(False)
        want = model.apply(variables, xb, False).astype(jnp.float32)
        sk.set_pair_dots(True)
        got = model.apply(variables, xb, False).astype(jnp.float32)
    finally:
        sk.set_pair_dots(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=0.05
    )


# ---------------------------------------------------------------------------
# Pool-on-read (r5): the encoder pool seams stop materializing — the
# consuming kernel pools full-res row bands in VMEM (ops/acts.DownTensor).
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_pool_on_read_stage_call_bit_exact(rng):
    """Direct _stage_call: a full-res down part pooled on read must match
    the same call on the materialized pooled part — bit-exact (same max
    association order; decimation is an exact one-hot selection)."""
    from ssunet_gan_tpu.ops import stage_kernel as sk
    from ssunet_gan_tpu.ops.acts import DownTensor, materialize_down

    planes, cin = 16, 8
    n, h, w = 2, 32, 16  # pooled dims; the down payload is 64×32
    for dtype in (jnp.bfloat16, jnp.float32):
        full = jnp.asarray(
            rng.normal(size=(n, 2 * h, cin, 2 * w)).astype(np.float32)
        ).astype(dtype)
        pooled = materialize_down(DownTensor(full))

        def arr(*s):
            return jnp.asarray(
                rng.normal(size=s).astype(np.float32)).astype(dtype)

        c = planes
        K1cat = arr(c, 9 * cin + 1)
        K2SC = arr(c, 9 * c + cin + 1)
        K1s = arr(3, 9 * c + 1)
        K2s = arr(4, 9 * 3 + 1)
        K3s = arr(2 * c, 9 * 4 + 1)
        want = sk._stage_call([pooled.v], K1cat, K2SC, K1s, K2s, K3s, 16)
        got = sk._stage_call([full], K1cat, K2SC, K1s, K2s, K3s, 16,
                             down=(True,))
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))


@pytest.mark.slow
def test_lazy_pool_model_parity(rng):
    """Flagship bf16 eval forward with lazy pool seams (default) vs
    materializing pools — bit-exact; f32 composition fallback unchanged.
    Also pins that the lazy form actually engages for bf16 W-minor."""
    from ssunet_gan_tpu.ops.acts import DownTensor
    from ssunet_gan_tpu.ops.wminor import (
        WTensor,
        pool2x2,
        pool2x2_with_indices,
        set_lazy_pool,
    )

    probe = pool2x2(WTensor(jnp.zeros((1, 16, 8, 16), jnp.bfloat16)))
    assert isinstance(probe, DownTensor)
    p2, code = pool2x2_with_indices(
        WTensor(jnp.zeros((1, 16, 8, 16), jnp.bfloat16)))
    assert isinstance(p2, DownTensor)
    assert not isinstance(
        pool2x2(WTensor(jnp.zeros((1, 16, 8, 16), jnp.float32))), DownTensor)

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    xb = x.astype(jnp.bfloat16)
    set_fused_stage(True)
    try:
        set_lazy_pool(False)
        want = model.apply(variables, xb, False)
        set_lazy_pool(True)
        got = model.apply(variables, xb, False)
        # composition fallback with lazy ON must materialize via _dq
        set_fused_stage(False)
        comp_lazy = model.apply(variables, x, False)
    finally:
        set_lazy_pool(None)
    comp = model.apply(variables, x, False)
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.asarray(want.astype(jnp.float32)))
    np.testing.assert_array_equal(np.asarray(comp_lazy), np.asarray(comp))


@pytest.mark.slow
def test_bneck_tall_bands_and_upsample_on_read(rng):
    """r5 bneck-kernel upgrades: band heights beyond the historical th=8
    are value-invariant, and an UpTensor part expands on read bit-exactly
    vs the same call on the materialized part (the bneck halo is L=4)."""
    from ssunet_gan_tpu.ops import stage_kernel as sk
    from ssunet_gan_tpu.ops.acts import UpTensor, materialize_up
    from ssunet_gan_tpu.ops.blocks import Bottleneck
    from ssunet_gan_tpu.ops.spade import SPADE

    planes = 16
    n, h, w = 2, 32, 16
    cp0, cp1 = 8, 16
    skip = jnp.asarray(
        rng.normal(size=(n, h, w, cp0)).astype(np.float32)
    ).astype(jnp.bfloat16)
    halfv = jnp.asarray(
        rng.normal(size=(n, h // 2, cp1, w)).astype(np.float32)
    ).astype(jnp.bfloat16)
    upt = UpTensor(halfv)
    full = materialize_up(upt)
    xin = (skip, jnp.swapaxes(full.v, 2, 3))
    block = Bottleneck(planes, in_planes=cp0 + cp1)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), xin, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    y0 = jnp.zeros((n, h, w, planes), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), y0, y0))()
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)

    try:
        sk.set_band_rows(16)
        want = sk.fused_eval_stage_bneck((skip, full), bp, sp)
        got = sk.fused_eval_stage_bneck((skip, upt), bp, sp)
    finally:
        sk.set_band_rows(None)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32))

    want8 = sk.fused_eval_stage_bneck((skip, full), bp, sp)  # th=8 default
    try:
        sk.set_band_rows(16)
        got16 = sk.fused_eval_stage_bneck((skip, full), bp, sp)
    finally:
        sk.set_band_rows(None)
    np.testing.assert_array_equal(
        np.asarray(got16, np.float32), np.asarray(want8, np.float32))
