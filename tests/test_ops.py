"""Parity tests for resize / pool / norm primitives vs torch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.ops import pool as P
from ssunet_gan_tpu.ops import resize as R
from ssunet_gan_tpu.ops.norm import BatchNorm

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def nchw(x_nhwc):
    return np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2)))


def nhwc(x_nchw):
    return np.ascontiguousarray(np.transpose(x_nchw, (0, 2, 3, 1)))


@pytest.fixture()
def x(rng):
    return rng.normal(size=(2, 12, 10, 5)).astype(np.float32)


def test_upsample_bilinear_align_corners_parity(x):
    ref = F.interpolate(torch.tensor(nchw(x)), scale_factor=2, mode="bilinear", align_corners=True)
    got = R.upsample_bilinear(jnp.asarray(x), 2, align_corners=True)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=1e-5)


def test_resize_bilinear_half_pixel_parity(x):
    ref = F.interpolate(torch.tensor(nchw(x)), size=(7, 9), mode="bilinear", align_corners=False)
    got = R.resize_bilinear(jnp.asarray(x), 7, 9, align_corners=False)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=1e-5)


def test_upsample_nearest_parity(x):
    ref = F.interpolate(torch.tensor(nchw(x)), scale_factor=2)  # nearest
    got = R.upsample_nearest(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=0)


def test_adaptive_avg_pool_parity(rng):
    x = rng.normal(size=(2, 32, 32, 4)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.tensor(nchw(x)), (6, 6))
    got = R.adaptive_avg_pool(jnp.asarray(x), 6, 6)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=1e-5)

    # non-divisible input too
    x = rng.normal(size=(1, 17, 13, 3)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.tensor(nchw(x)), (6, 6))
    got = R.adaptive_avg_pool(jnp.asarray(x), 6, 6)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=1e-5)


def test_pixel_shuffle_parity(rng):
    x = rng.normal(size=(2, 6, 5, 16)).astype(np.float32)
    ref = F.pixel_shuffle(torch.tensor(nchw(x)), 2)
    got = R.pixel_shuffle(jnp.asarray(x), 2)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=0)


def test_max_pool_parity(x):
    ref = F.max_pool2d(torch.tensor(nchw(x)), 2, 2)
    got = P.max_pool_2x2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=0)


def test_max_pool_unpool_roundtrip_parity(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    t = torch.tensor(nchw(x))
    pooled_t, idx_t = F.max_pool2d(t, 2, 2, return_indices=True)
    unpooled_t = F.max_unpool2d(pooled_t, idx_t, 2, 2)

    pooled, code = P.max_pool_2x2_with_indices(jnp.asarray(x))
    unpooled = P.max_unpool_2x2(pooled, code)

    np.testing.assert_allclose(np.asarray(pooled), nhwc(pooled_t.numpy()), atol=0)
    np.testing.assert_allclose(np.asarray(unpooled), nhwc(unpooled_t.numpy()), atol=0)


def test_max_unpool_with_decoder_values(rng):
    # the v2 decoder unpools *different* values through saved indices
    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    vals = rng.normal(size=(1, 3, 3, 2)).astype(np.float32)
    t = torch.tensor(nchw(x))
    _, idx_t = F.max_pool2d(t, 2, 2, return_indices=True)
    ref = F.max_unpool2d(torch.tensor(nchw(vals)), idx_t, 2, 2)

    _, code = P.max_pool_2x2_with_indices(jnp.asarray(x))
    got = P.max_unpool_2x2(jnp.asarray(vals), code)
    np.testing.assert_allclose(np.asarray(got), nhwc(ref.numpy()), atol=0)


def test_batchnorm_train_eval_parity(rng):
    x1 = rng.normal(size=(4, 6, 6, 5)).astype(np.float32) * 2 + 1
    x2 = rng.normal(size=(4, 6, 6, 5)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.normal(size=5).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=5).astype(np.float32)))

    bn = BatchNorm(5)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1), True)
    params = {
        "scale": jnp.asarray(tbn.weight.detach().numpy()),
        "bias": jnp.asarray(tbn.bias.detach().numpy()),
    }
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    # two training steps — outputs and running stats must track torch
    tbn.train()
    for xb in (x1, x2):
        ref_out = tbn(torch.tensor(nchw(xb))).detach().numpy()
        out, updates = bn.apply(
            variables, jnp.asarray(xb), True, mutable=["batch_stats"]
        )
        variables = {"params": params, **updates}
        np.testing.assert_allclose(np.asarray(out), nhwc(ref_out), atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-5,
    )

    # eval mode with running stats
    tbn.eval()
    ref_out = tbn(torch.tensor(nchw(x1))).detach().numpy()
    out = bn.apply(variables, jnp.asarray(x1), False)
    np.testing.assert_allclose(np.asarray(out), nhwc(ref_out), atol=1e-4)

