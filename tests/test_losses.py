"""Parity tests for losses vs the reference's torch implementation.

The reference modules are imported from /root/reference/scripts as a
golden oracle; nothing is copied.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ssunet_gan_tpu.ops import losses as L
from tests.conftest import requires_reference


def _rand_logits_targets(rng, shape=(4, 3, 16, 16)):
    logits = rng.normal(size=shape).astype(np.float32) * 3.0
    targets = (rng.random(shape) > 0.5).astype(np.float32)
    return logits, targets


def test_stable_bce_known_value():
    logits = np.array([[0.0, 100.0, -100.0, 2.0]], np.float32)
    targets = np.array([[0.0, 1.0, 0.0, 1.0]], np.float32)
    # elementwise: log(2), 0, 0, log(1+e^-2)
    expected = np.mean([np.log(2.0), 0.0, 0.0, np.log1p(np.exp(-2.0))])
    got = float(L.stable_bce(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isclose(got, expected, atol=1e-6)


def test_bce_dice_perfect_prediction_low_loss():
    targets = np.ones((2, 1, 8, 8), np.float32)
    logits = np.full_like(targets, 20.0)
    loss = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert loss < 1e-3


def test_registry_names():
    assert set(L.LOSS_NAMES) == {"BCEDiceLoss", "LovaszHingeLoss", "BCEWithLogitsLoss"}
    with pytest.raises(KeyError):
        L.get_loss("nope")


@requires_reference
def test_stable_bce_parity(reference_path, rng):
    import torch
    import losses as ref_losses

    logits, targets = _rand_logits_targets(rng)
    ref = ref_losses.StableBCELoss()(torch.tensor(logits), torch.tensor(targets))
    got = float(L.stable_bce(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isclose(got, float(ref), atol=1e-5)


@requires_reference
def test_bce_dice_parity(reference_path, rng):
    import torch
    import losses as ref_losses

    logits, targets = _rand_logits_targets(rng)
    ref = ref_losses.BCEDiceLoss()(torch.tensor(logits), torch.tensor(targets))
    got = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isclose(got, float(ref), atol=1e-5)


@requires_reference
def test_bce_dice_nan_fallback_parity(reference_path, rng):
    import torch
    import losses as ref_losses

    logits, targets = _rand_logits_targets(rng, (2, 1, 8, 8))
    logits[0, 0, 0, 0] = np.nan  # drives BCE to NaN → fallback 2·dice path
    ref = ref_losses.BCEDiceLoss()(torch.tensor(logits), torch.tensor(targets))
    got = float(L.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    # both should hit the 2*dice fallback (losses.py:297-300); NaN logit also
    # propagates into dice through sigmoid in both frameworks
    assert np.isnan(float(ref)) == np.isnan(got)
    if not np.isnan(got):
        assert np.isclose(got, float(ref), atol=1e-5)


@requires_reference
def test_lovasz_hinge_parity(reference_path, rng):
    import torch
    import losses as ref_losses

    logits = rng.normal(size=(3, 1, 12, 12)).astype(np.float32) * 2
    targets = (rng.random((3, 1, 12, 12)) > 0.5).astype(np.float32)
    ref = ref_losses.LovaszHingeLoss()(torch.tensor(logits), torch.tensor(targets))
    got = float(L.lovasz_hinge_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert np.isclose(got, float(ref), atol=1e-4)


@requires_reference
def test_masked_l1_parity(reference_path, rng):
    import torch
    import losses as ref_losses

    # reference operates on NCHW (losses.py:255-272); ours on NHWC
    inputs = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    targets = (rng.random((2, 4, 8, 8)) > 0.5).astype(np.float32)
    outputs = rng.random((2, 4, 8, 8)).astype(np.float32)
    ref = ref_losses.masked_L1_loss(
        torch.tensor(inputs), torch.tensor(targets), torch.tensor(outputs)
    )
    got = float(
        L.masked_l1_loss(
            jnp.asarray(inputs.transpose(0, 2, 3, 1)),
            jnp.asarray(targets.transpose(0, 2, 3, 1)),
            jnp.asarray(outputs.transpose(0, 2, 3, 1)),
        )
    )
    assert np.isclose(got, float(ref), atol=1e-5)


@requires_reference
def test_lovasz_softmax_parity_all_present(reference_path, rng):
    import torch
    import losses as ref_losses

    # probabilities in NCHW for reference, NHWC for ours
    probs = rng.random((2, 3, 10, 10)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 10, 10)).astype(np.int64)
    ref = ref_losses.lovasz_softmax(
        torch.tensor(probs), torch.tensor(labels), classes="present", per_image=False
    )
    got = float(
        L.lovasz_softmax(jnp.asarray(probs.transpose(0, 2, 3, 1)), jnp.asarray(labels))
    )
    assert np.isclose(got, float(ref), atol=1e-4)


@requires_reference
def test_iou_binary_parity(reference_path, rng):
    import losses as ref_losses
    import torch

    preds = (rng.random((4, 16, 16)) > 0.5).astype(np.int64)
    labels = (rng.random((4, 16, 16)) > 0.5).astype(np.int64)
    for per_image in (True, False):
        ref = ref_losses.iou_binary(
            torch.tensor(preds), torch.tensor(labels), per_image=per_image
        )
        got = float(L.iou_binary(jnp.asarray(preds), jnp.asarray(labels),
                                 per_image=per_image))
        assert np.isclose(got, float(ref), atol=1e-4), (per_image, got, ref)


@requires_reference
def test_iou_binary_ignore_and_empty(reference_path, rng):
    import losses as ref_losses
    import torch

    # an all-background pair exercises the EMPTY fallback
    preds = np.zeros((2, 8, 8), np.int64)
    labels = np.zeros((2, 8, 8), np.int64)
    labels[0, :2] = 2  # void label
    ref = ref_losses.iou_binary(torch.tensor(preds), torch.tensor(labels),
                                ignore=2, per_image=True)
    got = float(L.iou_binary(jnp.asarray(preds), jnp.asarray(labels),
                             ignore=2, per_image=True))
    assert np.isclose(got, float(ref), atol=1e-4)


@requires_reference
def test_iou_multiclass_parity(reference_path, rng):
    import losses as ref_losses
    import torch

    # reference bug: its iou() uses np.array but losses.py never imports
    # numpy — NameError at runtime. Inject it so the oracle math can run.
    ref_losses.np = np

    C = 4
    preds = rng.integers(0, C, (3, 12, 12)).astype(np.int64)
    labels = rng.integers(0, C, (3, 12, 12)).astype(np.int64)
    for per_image, ignore in [(False, None), (True, None), (True, 2)]:
        ref = ref_losses.iou(torch.tensor(preds), torch.tensor(labels), C,
                             ignore=ignore, per_image=per_image)
        got = np.asarray(L.iou(jnp.asarray(preds), jnp.asarray(labels), C,
                               ignore=ignore, per_image=per_image))
        np.testing.assert_allclose(got, np.asarray(ref, np.float64), atol=1e-4,
                                   err_msg=str((per_image, ignore)))


@requires_reference
def test_binary_xloss_parity(reference_path, rng):
    import losses as ref_losses
    import torch

    logits = rng.normal(size=(2, 16, 16)).astype(np.float32) * 3
    labels = (rng.random((2, 16, 16)) > 0.5).astype(np.int64)
    labels[0, :4] = 2  # void pixels for the ignore case
    for ignore in (None, 2):
        ref = ref_losses.binary_xloss(
            torch.tensor(logits), torch.tensor(labels), ignore=ignore
        )
        got = float(L.binary_xloss(jnp.asarray(logits), jnp.asarray(labels),
                                   ignore=ignore))
        assert np.isclose(got, float(ref), atol=1e-5), (ignore, got, ref)


@requires_reference
def test_xloss_parity(reference_path, rng):
    import losses as ref_losses
    import torch

    C = 3
    logits = rng.normal(size=(2, C, 8, 8)).astype(np.float32)
    labels = rng.integers(0, C, (2, 8, 8)).astype(np.int64)
    labels[1, :2] = 255  # pixels hit the hardcoded ignore_index=255
    ref = ref_losses.xloss(torch.tensor(logits), torch.tensor(labels), ignore=7)
    got = float(L.xloss(jnp.asarray(np.moveaxis(logits, 1, -1)),
                        jnp.asarray(labels), ignore=7))
    assert np.isclose(got, float(ref), atol=1e-5)


@requires_reference
def test_lovasz_softmax_per_image_and_ignore_parity(reference_path, rng):
    import losses as ref_losses
    import torch

    C = 3
    probas = rng.random((2, C, 8, 8)).astype(np.float32)
    probas /= probas.sum(1, keepdims=True)
    labels = rng.integers(0, C, (2, 8, 8)).astype(np.int64)
    labels[0, :2] = 7  # void
    for per_image, ignore, classes in [
        (True, None, "present"),
        (False, 7, "present"),
        (True, 7, "present"),
        (False, None, "all"),
        (False, None, [0, 2]),
    ]:
        ref = ref_losses.lovasz_softmax(
            torch.tensor(probas), torch.tensor(labels),
            classes=classes, per_image=per_image, ignore=ignore,
        )
        got = float(
            L.lovasz_softmax(
                jnp.asarray(np.moveaxis(probas, 1, -1)), jnp.asarray(labels),
                classes=classes, per_image=per_image, ignore=ignore,
            )
        )
        assert np.isclose(got, float(ref), atol=1e-4), (per_image, ignore, classes, got, ref)
