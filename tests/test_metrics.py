import numpy as np

import jax.numpy as jnp

from ssunet_gan_tpu.ops import metrics as M
from tests.conftest import requires_reference


def test_iou_perfect():
    logits = np.where(np.eye(8) > 0, 10.0, -10.0).astype(np.float32)
    target = np.eye(8).astype(np.float32)
    assert float(M.iou_score(jnp.asarray(logits), jnp.asarray(target))) > 0.999


def test_foreground_slice_drops_background():
    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3)
    fg = M.foreground_slice(x, 3)
    assert fg.shape == (2, 4, 4, 2)
    assert (fg == x[..., 1:3]).all()


@requires_reference
def test_iou_parity(reference_path, rng):
    import torch
    import metrics as ref_metrics

    logits = rng.normal(size=(2, 2, 16, 16)).astype(np.float32) * 2
    target = (rng.random((2, 2, 16, 16)) > 0.5).astype(np.float32)
    ref = ref_metrics.iou_score(torch.tensor(logits), torch.tensor(target))
    got = float(M.iou_score(jnp.asarray(logits), jnp.asarray(target)))
    assert np.isclose(got, float(ref), atol=1e-6)


@requires_reference
def test_iou_nan_handling_parity(reference_path, rng):
    import torch
    import metrics as ref_metrics

    logits = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    logits[0, 0, :2, :2] = np.nan  # NaN probs → False (metrics.py:15)
    target = (rng.random((1, 1, 8, 8)) > 0.5).astype(np.float32)
    ref = ref_metrics.iou_score(torch.tensor(logits), torch.tensor(target))
    got = float(M.iou_score(jnp.asarray(logits), jnp.asarray(target)))
    assert np.isclose(got, float(ref), atol=1e-6)


@requires_reference
def test_dice_parity(reference_path, rng):
    import torch
    import metrics as ref_metrics

    logits = rng.normal(size=(2, 2, 16, 16)).astype(np.float32) * 2
    target = (rng.random((2, 2, 16, 16)) > 0.5).astype(np.float32)
    ref = ref_metrics.dice_coef(torch.tensor(logits), torch.tensor(target))
    got = float(M.dice_coef(jnp.asarray(logits), jnp.asarray(target)))
    assert np.isclose(got, float(ref), atol=1e-6)
