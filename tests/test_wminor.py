"""W-minor seam ops (ops/wminor.py): parity vs the NHWC reference ops.

The fused eval path keeps activations in the kernels' native (N, H, C, W)
orientation across pool / unpool / upsample seams; these tests pin the
W-minor implementations to the NHWC originals (ops/pool.py, ops/resize.py)
that are themselves parity-tested against torch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ssunet_gan_tpu.ops.pool import (
    max_pool_2x2,
    max_pool_2x2_with_indices,
    max_unpool_2x2,
)
from ssunet_gan_tpu.ops.resize import upsample_bilinear
from ssunet_gan_tpu.ops.stage_kernel_int8 import QTensor
from ssunet_gan_tpu.ops.wminor import (
    WCode,
    WTensor,
    pool2x2,
    pool2x2_with_indices,
    to_nhwc,
    unpool2x2,
    upsample2x,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape), jnp.float32)


def _wt(x):  # NHWC → WTensor
    return WTensor(jnp.swapaxes(x, 2, 3))


def test_wtensor_logical_shape_dtype():
    x = _rand((2, 8, 6, 5))
    t = _wt(x)
    assert t.shape == (2, 8, 6, 5)
    assert t.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(to_nhwc(t)), np.asarray(x))


def test_pool2x2_wminor_matches_nhwc():
    x = _rand((2, 10, 8, 7), seed=1)  # odd channel count on purpose
    ref = max_pool_2x2(x)
    out = pool2x2(_wt(x))
    assert isinstance(out, WTensor)
    np.testing.assert_array_equal(np.asarray(to_nhwc(out)), np.asarray(ref))


def test_pool2x2_wminor_odd_spatial_crop():
    x = _rand((1, 9, 7, 4), seed=2)  # floor-crop semantics
    ref = max_pool_2x2(x)
    out = pool2x2(_wt(x))
    np.testing.assert_array_equal(np.asarray(to_nhwc(out)), np.asarray(ref))


def test_pool_with_indices_and_unpool_roundtrip_matches_nhwc():
    x = _rand((2, 8, 8, 5), seed=3)
    ref_p, ref_idx = max_pool_2x2_with_indices(x)
    p, code = pool2x2_with_indices(_wt(x))
    assert isinstance(p, WTensor) and isinstance(code, WCode)
    np.testing.assert_array_equal(np.asarray(to_nhwc(p)), np.asarray(ref_p))

    vals = _rand(ref_p.shape, seed=4)
    ref_up = max_unpool_2x2(vals, ref_idx)
    up = unpool2x2(vals, code)  # NHWC values + WCode → W-minor unpool
    assert isinstance(up, WTensor)
    np.testing.assert_array_equal(np.asarray(to_nhwc(up)), np.asarray(ref_up))

    up2 = unpool2x2(_wt(vals), code)  # W-minor values + WCode
    np.testing.assert_array_equal(np.asarray(to_nhwc(up2)), np.asarray(ref_up))


def test_pool_indices_tie_breaks_first_max():
    # equal values in one window: the first (TL-most, row-major) wins,
    # matching jnp.argmax / torch
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    _, code = pool2x2_with_indices(_wt(x))
    assert int(code.c.reshape(-1)[0]) == 0
    x = x.at[0, 0, 1, 0].set(1.0).at[0, 1, 1, 0].set(1.0)  # TR == BR
    _, code = pool2x2_with_indices(_wt(x))
    assert int(code.c.reshape(-1)[0]) == 1


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_upsample2x_wminor_matches_nhwc(dtype):
    from ssunet_gan_tpu.ops.wminor import UpTensor, set_lazy_upsample

    x = _rand((2, 6, 5, 3), seed=5).astype(dtype)
    ref = upsample_bilinear(x, 2, align_corners=True)
    try:
        set_lazy_upsample(False)
        out = upsample2x(_wt(x), align_corners=True)
    finally:
        set_lazy_upsample(None)
    assert isinstance(out, WTensor)
    np.testing.assert_allclose(
        np.asarray(to_nhwc(out), np.float32),
        np.asarray(ref, np.float32),
        rtol=0, atol=0,
    )
    # default (lazy auto-ON): bf16 W-minor seams come back as UpTensor;
    # the materializing fallback is the W-then-H association — ≤2 ulp f32
    # from the reference, identical after bf16 rounding except ties
    # (ops/acts.materialize_up). The in-kernel consumer is pinned bit-exact
    # separately (tests/test_stage_kernel.py).
    lazy = upsample2x(_wt(x), align_corners=True)
    if dtype == jnp.bfloat16:
        assert isinstance(lazy, UpTensor)
        a = np.asarray(to_nhwc(lazy), np.float32)
        b = np.asarray(ref, np.float32)
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)
    else:
        assert isinstance(lazy, WTensor)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("hw", [(6, 5), (16, 16), (3, 7)])
def test_upsample2x_shift_lerp_parity(dtype, align_corners, hw):
    """The shift_lerp H-interp lowering (no major-axis contraction) must be
    bit-exact vs einsum_hw in bf16 (exact bf16 products in f32) and within
    1 ulp in f32 (XLA may contract the lerp into an FMA, skipping the
    einsum's per-product rounding)."""
    from ssunet_gan_tpu.ops.wminor import set_upsample_impl, upsample_impl

    h, w = hw
    x = _rand((2, h, 4, w), seed=11).astype(dtype)
    ref = upsample2x(_wt(x), align_corners=align_corners)
    assert upsample_impl() == "einsum_hw"
    set_upsample_impl("shift_lerp")
    try:
        out = upsample2x(_wt(x), align_corners=align_corners)
    finally:
        set_upsample_impl("einsum_hw")
    got = np.asarray(out.v, np.float32)
    want = np.asarray(ref.v, np.float32)
    if dtype == jnp.bfloat16:
        np.testing.assert_array_equal(got, want)
    else:
        # f32: ≤ a few ulp at the activation magnitude (FMA contraction of
        # the lerp, then cancellation through the W contraction)
        atol = 4 * np.finfo(np.float32).eps * np.abs(want).max()
        np.testing.assert_allclose(got, want, rtol=0, atol=atol)


def test_shift_lerp_weights_reject_non_2x():
    """Non-2× row matrices must fall back (guard returns None)."""
    from ssunet_gan_tpu.ops.resize import _linear_matrix
    from ssunet_gan_tpu.ops.wminor import _shift_lerp_weights

    rm = np.asarray(_linear_matrix(6, 13, True))
    assert _shift_lerp_weights(rm, 6) is None
    rm2 = np.asarray(_linear_matrix(6, 12, True))
    assert _shift_lerp_weights(rm2, 6) is not None


def test_qtensor_wminor_pool_and_dequant():
    x = _rand((2, 8, 6, 4), seed=6)
    q = jnp.clip(jnp.round(x / 0.02), -127, 127).astype(jnp.int8)
    t = QTensor(jnp.swapaxes(q, 2, 3), 0.02, jnp.float32, wminor=True)
    assert t.shape == (2, 8, 6, 4)
    # dequant always returns NHWC
    np.testing.assert_allclose(
        np.asarray(t.dequant()), np.asarray(q, np.float32) * 0.02, rtol=1e-6
    )
    # r5: W-minor QTensor pools are LAZY by default (pool-on-read in the
    # s8 kernel) — the DownQTensor materializes to the same pooled QTensor
    from ssunet_gan_tpu.ops.acts import DownQTensor, materialize_down_q

    lazyp = pool2x2(t)
    assert isinstance(lazyp, DownQTensor)
    assert lazyp.shape == (2, 4, 3, 4)
    pooled = materialize_down_q(lazyp)
    assert isinstance(pooled, QTensor) and pooled.wminor
    eager = pool2x2(t, lazy=False)
    assert isinstance(eager, QTensor) and eager.wminor
    np.testing.assert_array_equal(np.asarray(eager.q), np.asarray(pooled.q))
    ref = max_pool_2x2(q.astype(jnp.int32)).astype(jnp.int8)
    np.testing.assert_array_equal(
        np.asarray(jnp.swapaxes(pooled.q, 2, 3)), np.asarray(ref)
    )
    p2, code = pool2x2_with_indices(t, lazy=False)
    assert isinstance(p2, QTensor) and p2.wminor and isinstance(code, WCode)
    np.testing.assert_array_equal(np.asarray(p2.q), np.asarray(pooled.q))


def test_conv2d_1x1_runs_native_on_wminor():
    # the UNet_R_SS_v2 per-level 1×1 heads receive fused-stage outputs;
    # on a WTensor they must run in W-minor (and keep the form), matching
    # the NHWC path bit-for-bit in f32
    import jax
    from ssunet_gan_tpu.ops.conv import Conv2d

    x = _rand((2, 8, 8, 6), seed=8)
    m = Conv2d(4, 1, use_bias=False)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    ref = m.apply(params, x)
    out = m.apply(params, _wt(x))
    assert isinstance(out, WTensor)
    np.testing.assert_allclose(
        np.asarray(to_nhwc(out)), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

    mb = Conv2d(4, 1)  # bias path
    params = jax.jit(mb.init)(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(to_nhwc(mb.apply(params, _wt(x)))),
        np.asarray(mb.apply(params, x)),
        rtol=1e-6, atol=1e-6,
    )


def test_conv2d_3x3_converts_wminor_input():
    # non-1×1 geometry: the W-minor input converts at the module boundary
    import jax
    from ssunet_gan_tpu.ops.conv import Conv2d

    x = _rand((1, 8, 8, 5), seed=9)
    m = Conv2d(7, 3, padding=1)
    params = jax.jit(m.init)(jax.random.PRNGKey(2), x)
    ref = m.apply(params, x)
    out = m.apply(params, _wt(x))
    assert not isinstance(out, WTensor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_plain_nhwc_passthrough():
    x = _rand((1, 4, 4, 2), seed=7)
    np.testing.assert_array_equal(
        np.asarray(pool2x2(x)), np.asarray(max_pool_2x2(x))
    )
    p, idx = pool2x2_with_indices(x)
    rp, ridx = max_pool_2x2_with_indices(x)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(rp))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_array_equal(
        np.asarray(unpool2x2(p, idx)), np.asarray(max_unpool_2x2(rp, ridx))
    )
    np.testing.assert_array_equal(
        np.asarray(upsample2x(x)), np.asarray(upsample_bilinear(x, 2, True))
    )


# ---------------------------------------------------------------------------
# Seam-op custom VJPs: the backward scatters to the RECORDED first-maximum
# corner (torch MaxPool2d semantics, incl. relu-zero ties) instead of
# autodiff's maximum-chain tie rule; unpool's backward gathers the recorded
# corner. Pinned against torch.
# ---------------------------------------------------------------------------


def _torch_pool_grad(x_nhwc, g_nhwc):
    import torch

    xt = torch.tensor(
        np.ascontiguousarray(np.moveaxis(np.asarray(x_nhwc), -1, 1)),
        requires_grad=True,
    )
    p = torch.nn.functional.max_pool2d(xt, 2, 2)
    p.backward(torch.tensor(
        np.ascontiguousarray(np.moveaxis(np.asarray(g_nhwc), -1, 1))
    ))
    return np.moveaxis(xt.grad.numpy(), 1, -1)


@pytest.mark.parametrize("seed,tie", [(3, False), (4, True)])
def test_pool2x2_wminor_grad_matches_torch(seed, tie):
    import jax

    x = _rand((2, 8, 6, 4), seed=seed)
    if tie:  # relu-style zeros: whole windows tie at 0.0
        x = jnp.maximum(x, 0.0) * (jnp.abs(x) > 0.8)
    g = _rand((2, 4, 3, 4), seed=seed + 10)

    def loss(x):
        out = pool2x2(_wt(x))
        return jnp.sum(to_nhwc(out) * g)

    got = jax.grad(loss)(x)
    want = _torch_pool_grad(x, g)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pool_with_indices_grad_matches_torch():
    import jax

    x = jnp.maximum(_rand((1, 6, 8, 3), seed=5), 0.0)  # relu ties included
    g = _rand((1, 3, 4, 3), seed=15)

    def loss(x):
        p, _ = pool2x2_with_indices(_wt(x))
        return jnp.sum(to_nhwc(p) * g)

    got = jax.grad(loss)(x)
    want = _torch_pool_grad(x, g)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_unpool2x2_grad_gathers_recorded_corner():
    import jax

    x = _rand((1, 6, 4, 3), seed=6)
    _, code = pool2x2_with_indices(_wt(x))
    v = _rand((1, 3, 2, 3), seed=7)
    g = _rand((1, 6, 4, 3), seed=8)

    def loss(v):
        return jnp.sum(to_nhwc(unpool2x2(_wt(v), code)) * g)

    got = jax.grad(loss)(v)
    # numpy reference: gather g at each value's recorded scatter corner
    gn = np.asarray(g)  # (N, H, W, C)
    cn = np.moveaxis(np.asarray(code.c), 2, 3)  # (N, H2, W2, C)
    n, h2, w2, c = cn.shape
    want = np.empty((n, h2, w2, c), np.float32)
    for i in np.ndindex(n, h2, w2, c):
        k = cn[i]
        want[i] = gn[i[0], 2 * i[1] + k // 2, 2 * i[2] + k % 2, i[3]]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_upsample_bwd_decomp_matches_einsum_transpose(rng):
    """r5: the train seams' H-interp einsum carries a copy-free custom
    backward (strided even/odd MAJOR-axis views + per-row weighted adds)
    — same math as autodiff's einsum transpose up to f32 re-association
    (bit-exact for the bf16 operands the train path uses)."""
    import jax

    from ssunet_gan_tpu.ops.acts import WTensor
    from ssunet_gan_tpu.ops import wminor as wm

    for dtype, bar in ((jnp.float32, 2e-6), (jnp.bfloat16, 0.0)):
        v = jnp.asarray(
            rng.normal(size=(2, 16, 8, 16)).astype(np.float32)).astype(dtype)
        g = jnp.asarray(
            rng.normal(size=(2, 32, 8, 32)).astype(np.float32)).astype(dtype)

        def f(x):
            out = wm.upsample2x(WTensor(x), align_corners=True)
            return jnp.sum(out.v.astype(jnp.float32) * g.astype(jnp.float32))

        try:
            wm.set_lazy_upsample(False)
            wm.set_up_bwd_decomp(False)
            want = np.asarray(jax.jit(jax.grad(f))(v), np.float32)
            wm.set_up_bwd_decomp(True)
            got = np.asarray(jax.jit(jax.grad(f))(v), np.float32)
        finally:
            wm.set_up_bwd_decomp(True)
            wm.set_lazy_upsample(None)
        rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
        assert rel <= max(bar, 0.0) or rel < 2e-6, rel
