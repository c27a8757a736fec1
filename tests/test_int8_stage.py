"""Tests for the int8 fused eval stage (ops/stage_kernel_int8.py).

On CPU the kernel runs in Pallas interpret mode, exercising the exact
kernel body. int8 is a quantized approximation of the f32 stage, so the
bars here are (a) tight agreement with an equivalent XLA-side quantized
reference of the same scheme where exactness is expected, and (b) bounded
relative error vs the f32 composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade
from ssunet_gan_tpu.ops.stage_kernel import set_fused_stage
from ssunet_gan_tpu.ops.stage_kernel_int8 import (
    fused_eval_stage_int8,
    quantize_tensor,
    set_int8_calibration,
    set_int8_stage,
    set_record_sink,
)
from ssunet_gan_tpu.utils import jit_init

from tests.test_stage_kernel import _init_pair, _reference_stage


@pytest.fixture(autouse=True)
def _restore_flags():
    yield
    set_fused_stage(None)
    set_int8_stage(False)
    set_fused_spade(None)
    set_int8_calibration(None)
    set_record_sink(None)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_quantize_tensor_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)).astype(np.float32))
    q, s = quantize_tensor(x)
    assert q.dtype == jnp.int8
    x2 = np.asarray(q, np.float32) * float(s)
    # max error is half a quantization step
    assert np.abs(x2 - np.asarray(x)).max() <= float(s) * 0.5 + 1e-7


@pytest.mark.parametrize(
    "planes,label,shapes,nh",
    [
        (16, 3, [(1, 16, 16, 8)], 4.0),
        (16, 3, [(2, 16, 16, 8), (2, 16, 16, 16)], 4.0),
        (32, 2, [(1, 24, 16, 16)], 8.0),
    ],
)
def test_int8_stage_close_to_f32(rng, planes, label, shapes, nh):
    """The int8 stage must track the f32 composition within quantization
    error (int8 per-channel weights + per-tensor/band activations)."""
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label, shapes, nh)
    want = np.asarray(_reference_stage(block, spade, bvars, svars, parts))

    from ssunet_gan_tpu.ops.blocks import BasicBlock

    in_planes = sum(s[-1] for s in shapes)
    bp = BasicBlock(block.planes, in_planes=in_planes).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    got = np.asarray(fused_eval_stage_int8(parts, bp, sp))

    assert np.isfinite(got).all()
    # quantization error bar: relative RMS error of a two-conv int8 chain
    scale = np.abs(want).max() + 1e-6
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rms < 0.02, f"relative RMS {rms:.4f}"
    # and the modulated outputs must be well correlated
    cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert cc > 0.999, cc


@pytest.mark.slow
def test_flagship_int8_model_runs_and_tracks_f32(rng):
    """Flagship eval forward with int8 stages: correlates with the f32
    path and produces near-identical sigmoid masks."""
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)

    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(model.apply(variables, x, False))

    set_fused_stage(True)
    set_int8_stage(True)
    got = np.asarray(model.apply(variables, x, False))
    assert np.isfinite(got).all()

    pw = 1.0 / (1.0 + np.exp(-want))
    pg = 1.0 / (1.0 + np.exp(-got))
    # mask agreement at threshold 0.5 (the metric that matters downstream)
    agree = np.mean((pw > 0.5) == (pg > 0.5))
    assert agree > 0.98, agree
    cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert cc > 0.99, cc


@pytest.mark.parametrize(
    "planes,cin,vgg", [(16, 8, False), (16, 16, False), (12, 12, True)]
)
def test_xla_int8_block_tracks_f32(rng, planes, cin, vgg):
    """The XLA-native s8-conv block (deep/unfused stages in int8 mode) must
    track the f32 module composition within quantization error."""
    import jax
    from ssunet_gan_tpu.ops.blocks import BasicBlock, VGGBlock
    from ssunet_gan_tpu.ops.stage_kernel_int8 import xla_int8_block

    x = jnp.asarray(rng.normal(size=(2, 8, 8, cin)).astype(np.float32))
    if vgg:
        block = VGGBlock(planes, planes, in_channels=cin)
    else:
        block = BasicBlock(planes, in_planes=cin)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(5), x, True))()
    want = np.asarray(block.apply(bvars, x, False))
    bp = block.apply(bvars, None, False)
    got = np.asarray(xla_int8_block((x,), bp, residual=not vgg))
    assert np.isfinite(got).all()
    scale = np.abs(want).max() + 1e-6
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rms < 0.02, f"relative RMS {rms:.4f}"


def test_static_calibration_stage_parity(rng):
    """With calibrated (exact) abs-max scales installed, the fused int8
    stage must match the dynamic-scale path bit-for-bit — the dynamic path
    computes exactly these maxima."""
    from ssunet_gan_tpu.ops.blocks import BasicBlock

    shapes = [(2, 16, 16, 8), (2, 16, 16, 16)]
    block, spade, bvars, svars, parts = _init_pair(rng, 16, 3, shapes, 4.0)
    bp = BasicBlock(block.planes, in_planes=24).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)

    dyn = np.asarray(fused_eval_stage_int8(parts, bp, sp))
    scales = {
        f"stage:{i}": float(jnp.max(jnp.abs(p))) for i, p in enumerate(parts)
    }
    set_int8_calibration(scales)
    stat = np.asarray(fused_eval_stage_int8(parts, bp, sp, calib_key="stage"))
    np.testing.assert_array_equal(dyn, stat)

    # saturation semantics: halving the calibrated range still yields a
    # finite, well-correlated output (values past the range clip to ±127)
    set_int8_calibration({k: v * 0.5 for k, v in scales.items()})
    sat = np.asarray(fused_eval_stage_int8(parts, bp, sp, calib_key="stage"))
    assert np.isfinite(sat).all()
    assert np.corrcoef(sat.ravel(), dyn.ravel())[0, 1] > 0.98


def test_int8_halo_carry_close_to_recompute(rng):
    """Opt-in halo carry in the int8 kernel: h1 carry is bit-exact; y/seg/
    actv carries keep the PRODUCING band's requant-scale provenance, a
    sub-quantization-step shift — so ON must track OFF tightly and keep
    the same quantization-error bar vs the f32 composition."""
    from ssunet_gan_tpu.ops.blocks import BasicBlock
    from ssunet_gan_tpu.ops.stage_kernel import set_halo_carry

    planes, label, shapes, nh = 16, 3, [(1, 64, 8, 8)], 4.0  # multi-band
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label,
                                                   shapes, nh)
    in_planes = sum(s[-1] for s in shapes)
    bp = BasicBlock(block.planes, in_planes=in_planes).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    try:
        set_halo_carry(False)
        off = np.asarray(fused_eval_stage_int8(parts, bp, sp))
        set_halo_carry(True)
        on = np.asarray(fused_eval_stage_int8(parts, bp, sp))
    finally:
        set_halo_carry(None)
    assert np.isfinite(on).all()
    scale = np.abs(off).max() + 1e-6
    # carried rows differ from recomputed ones by at most the h1 requant
    # rounding shift propagated through one conv — far below the int8
    # path's own 2% rms bar vs f32
    rms = np.sqrt(np.mean((on - off) ** 2)) / scale
    assert rms < 5e-3, f"carry-vs-recompute relative RMS {rms:.5f}"
    want = np.asarray(_reference_stage(block, spade, bvars, svars, parts))
    fscale = np.abs(want).max() + 1e-6
    rms_f = np.sqrt(np.mean((on - want) ** 2)) / fscale
    assert rms_f < 0.02, f"relative RMS vs f32 {rms_f:.4f}"


@pytest.mark.slow
def test_record_and_calibrate_flagship(rng, tmp_path):
    """End-to-end PTQ flow: record ranges on the flagship, install them,
    and check the calibrated int8 forward still tracks f32."""
    from ssunet_gan_tpu.infer.calibrate import (
        calibrate_int8,
        load_calibration,
        record_activation_ranges,
    )

    x = np.asarray(rng.normal(size=(2, 32, 32, 3)), np.float32)
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(x), False))

    ranges = record_activation_ranges(model, variables, x, batch_size=2)
    # every conv stage of the v2 arch records at least its first input part
    expected = {
        "conv0_0", "conv1_0", "conv2_0", "conv3_0", "conv4_0", "conv5_0",
        "conv4_1", "conv3_1", "conv2_1", "conv1_1", "conv0_1",
    }
    assert expected == {k.split(":")[0] for k in ranges}
    assert all(np.isfinite(v) and v > 0 for v in ranges.values())
    # the first stage sees the raw input: its range is the input abs-max
    assert ranges["conv0_0:0"] == pytest.approx(float(np.abs(x).max()), rel=1e-6)

    calibrate_int8(model, variables, x, model_dir=str(tmp_path), batch_size=2)
    assert load_calibration(str(tmp_path)) == pytest.approx(ranges)

    set_fused_stage(True)
    set_int8_stage(True)
    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    assert np.isfinite(got).all()
    pw = 1.0 / (1.0 + np.exp(-want))
    pg = 1.0 / (1.0 + np.exp(-got))
    assert np.mean((pw > 0.5) == (pg > 0.5)) > 0.98
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["SSUNet", "UNet_R_SS"])
def test_calibrated_int8_other_ss_archs(rng, arch):
    """The s8-emission keys added to SSUNet/UNet_R_SS must keep the
    calibrated int8 forward tracking f32 (exercises the QTensor flow
    through the VGG and 6-level BasicBlock pyramids)."""
    from ssunet_gan_tpu.infer.calibrate import calibrate_int8

    x = np.asarray(rng.normal(size=(2, 32, 32, 3)), np.float32)
    model = build_model(arch, num_classes=3, input_channels=3)
    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    want = np.asarray(model.apply(variables, jnp.asarray(x), False))

    calibrate_int8(model, variables, x, batch_size=2)
    set_fused_stage(True)
    set_int8_stage(True)
    got = np.asarray(model.apply(variables, jnp.asarray(x), False))
    assert np.isfinite(got).all()
    pw = 1.0 / (1.0 + np.exp(-want))
    pg = 1.0 / (1.0 + np.exp(-got))
    assert np.mean((pw > 0.5) == (pg > 0.5)) > 0.98
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


def test_int8_dispatch_respects_flag(rng):
    """int8 OFF must leave the bf16 fused path bit-identical."""
    from ssunet_gan_tpu.ops import stage_kernel_int8

    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    set_fused_stage(True)
    variables = jit_init(model, jax.random.PRNGKey(0), x, train=False)
    a = np.asarray(model.apply(variables, x, False))
    assert not stage_kernel_int8.int8_stage_enabled()
    b = np.asarray(model.apply(variables, x, False))
    np.testing.assert_array_equal(a, b)


def test_int8_stage_seg_stacked_matches_per_row(rng):
    """Seg stacking under int8: identical SPADE tail math, so the fused
    int8 stage with the flag on must track the flag-off output closely."""
    from ssunet_gan_tpu.ops.stage_kernel import set_seg_stack

    planes, label, nh = 16, 3, 4.0
    shapes = [(1, 16, 16, 8)]
    block, spade, bvars, svars, parts = _init_pair(rng, planes, label,
                                                   shapes, nh)
    from ssunet_gan_tpu.ops.blocks import BasicBlock

    in_planes = sum(s2[-1] for s2 in shapes)
    bp = BasicBlock(block.planes, in_planes=in_planes).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    base = fused_eval_stage_int8(parts, bp, sp)
    set_seg_stack(True)
    try:
        got = fused_eval_stage_int8(parts, bp, sp)
    finally:
        set_seg_stack(None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=2e-4, atol=2e-4
    )


def test_int8_lookahead_matches_prologue(rng):
    """Lookahead grid in the int8 kernel: bit-exact vs the prologue grid
    (same masked rows → same per-band h1 requant scales)."""
    from ssunet_gan_tpu.ops.blocks import BasicBlock
    from ssunet_gan_tpu.ops.stage_kernel import set_lookahead

    block, spade, bvars, svars, parts = _init_pair(
        rng, 16, 3, [(2, 16, 16, 8), (2, 16, 16, 16)], 4.0
    )
    bp = BasicBlock(block.planes, in_planes=24).apply(bvars, None, False)
    sp = spade.apply(svars, None, None)
    try:
        set_lookahead(False)
        want = np.asarray(fused_eval_stage_int8(parts, bp, sp))
        set_lookahead(True)
        got = np.asarray(fused_eval_stage_int8(parts, bp, sp))
    finally:
        set_lookahead(None)
    np.testing.assert_array_equal(got, want)


def test_int8_stage_lazy_upsample_close_to_materialized(rng):
    """int8 upsample-on-read: an UpTensor part (half-H s8, expanded +
    requantized per row in the kernel) must track the same stage fed the
    materialized full-res part within quantization error — the lerp
    requant adds ≤0.5 step on interpolated rows (stage_kernel_int8
    _upsample_on_read_s8)."""
    from ssunet_gan_tpu.ops.acts import UpTensor, WTensor, materialize_up
    from ssunet_gan_tpu.ops.blocks import BasicBlock
    from ssunet_gan_tpu.ops.spade import SPADE

    planes, lab, nh = 16, 3, 4.0
    n, h, w = 2, 32, 16
    cp0, cp1 = 8, 16
    skip = jnp.asarray(rng.normal(size=(n, h, cp0, w)).astype(np.float32))
    half = jnp.asarray(rng.normal(size=(n, h // 2, cp1, w)).astype(np.float32))
    skip, half = skip.astype(jnp.bfloat16), half.astype(jnp.bfloat16)
    full = materialize_up(UpTensor(half))

    block = BasicBlock(planes, in_planes=cp0 + cp1)
    x_nhwc = (
        jnp.swapaxes(skip, 2, 3).astype(jnp.float32),
        jnp.swapaxes(full.v, 2, 3).astype(jnp.float32),
    )
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(5), x_nhwc, True))()
    spade = SPADE("spadebatch3x3", planes, lab, nh)
    y0 = jnp.zeros((n, h, w, planes), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(6), y0, y0))()
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)

    want = np.asarray(
        fused_eval_stage_int8((WTensor(skip), full), bp, sp), np.float32
    )
    got = np.asarray(
        fused_eval_stage_int8((WTensor(skip), UpTensor(half)), bp, sp),
        np.float32,
    )
    assert np.isfinite(got).all()
    scale = np.abs(want).max() + 1e-6
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    assert rms < 0.02, f"relative RMS {rms:.4f}"


@pytest.mark.slow
def test_int8_pair_dots_matches_per_row(rng):
    """int8 pair mode reuses the per-row-quantized weights in 2-row blocks
    (zero blocks exact in s8) — identical s32 accumulations, so exact."""
    import jax

    from ssunet_gan_tpu.ops import stage_kernel as sk
    from ssunet_gan_tpu.ops import stage_kernel_int8 as sk8
    from ssunet_gan_tpu.ops.blocks import BasicBlock
    from ssunet_gan_tpu.ops.spade import SPADE

    planes = 16
    n, h, w = 2, 32, 16
    cp0, cp1 = 8, 16
    skip = jnp.asarray(rng.normal(size=(n, h, w, cp0)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(n, h, w, cp1)).astype(np.float32))
    xin = (skip, x2)
    block = BasicBlock(planes, in_planes=cp0 + cp1)
    bvars = jax.jit(lambda: block.init(jax.random.PRNGKey(3), xin, True))()
    spade = SPADE("spadebatch3x3", planes, 3, 4.0)
    y0 = jnp.zeros((n, h, w, planes), jnp.float32)
    svars = jax.jit(lambda: spade.init(jax.random.PRNGKey(4), y0, y0))()
    bp = block.apply(bvars, None, False)
    sp = spade.apply(svars, None, None)

    sk.set_pair_dots(False)
    want = sk8.fused_eval_stage_int8(xin, bp, sp)
    sk.set_pair_dots(True)
    got = sk8.fused_eval_stage_int8(xin, bp, sp)
    sk.set_pair_dots(None)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_int8_lazy_pool_model_parity(rng):
    """Calibrated int8 flagship forward with lazy pool seams (pool-on-read
    in the s8 kernel; DownQTensor in the kernel-to-kernel flow) vs
    materializing pools — bit-exact (s8 max-pooling commutes with
    symmetric quantization; the decimation dot is exact in s32)."""
    from ssunet_gan_tpu.infer.calibrate import calibrate_int8
    from ssunet_gan_tpu.ops.stage_kernel_int8 import set_int8_calibration
    from ssunet_gan_tpu.ops.wminor import set_lazy_pool

    x = np.asarray(rng.normal(size=(2, 32, 32, 3)), np.float32)
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    set_fused_stage(False)
    variables = jit_init(model, jax.random.PRNGKey(0), jnp.asarray(x),
                         train=False)
    calibrate_int8(model, variables, x, batch_size=2)
    set_fused_stage(True)
    set_int8_stage(True)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    try:
        set_lazy_pool(False)
        want = np.asarray(model.apply(variables, xb, False), np.float32)
        set_lazy_pool(True)
        got = np.asarray(model.apply(variables, xb, False), np.float32)
    finally:
        set_lazy_pool(None)
        set_int8_stage(False)
        set_int8_calibration(None)
    np.testing.assert_array_equal(got, want)
