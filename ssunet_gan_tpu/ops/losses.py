"""Segmentation losses — functional, jittable, on-device.

Behaviour-parity re-implementations of /root/reference/scripts/losses.py:

- :func:`stable_bce`           ← StableBCELoss (losses.py:130-136)
- :func:`bce_dice_loss`        ← BCEDiceLoss incl. the NaN/Inf → 2·dice
                                 fallback (losses.py:274-302)
- :func:`lovasz_hinge`         ← lovasz_hinge / lovasz_hinge_flat / lovasz_grad
                                 (losses.py:19-31, 79-112)
- :func:`lovasz_softmax`       ← lovasz_softmax_flat (losses.py:154-200),
                                 classes='all' (the 'present' filter is
                                 data-dependent control flow; under jit we
                                 weight every class by its presence instead,
                                 which is numerically identical for
                                 classes='present' when all classes appear)
- :func:`masked_l1_loss`       ← masked_L1_loss (losses.py:255-272)
- :func:`bce_with_logits_loss` ← torch.nn.BCEWithLogitsLoss (train.py:243-244)

All functions take *logits* (except lovasz_softmax which takes probabilities,
matching the reference) with channels-last layout; layout only matters for
:func:`masked_l1_loss` / channel slicing, reductions are layout-agnostic.

The registry mirrors ``losses.__all__ + ['BCEWithLogitsLoss']``
(losses.py:16, train.py:32-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5


def stable_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable mean BCE on logits (losses.py:133-136)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, min=0) - logits * targets + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def bce_with_logits_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch.nn.BCEWithLogitsLoss (mean reduction) — same math as stable_bce."""
    return stable_bce(logits, targets)


def soft_dice(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Soft dice term of BCEDiceLoss (losses.py:286-292): per-sample dice on
    sigmoid probabilities, averaged over the batch, returned as (1 - dice)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    num = probs.shape[0]
    probs = probs.reshape(num, -1)
    targets = targets.astype(jnp.float32).reshape(num, -1)
    intersection = jnp.sum(probs * targets, axis=1)
    dice = (2.0 * intersection + SMOOTH) / (
        jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1) + SMOOTH
    )
    return 1.0 - jnp.sum(dice) / num


def bce_dice_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """0.5·StableBCE + soft-dice with non-finite-BCE fallback to 2·dice
    (losses.py:280-302)."""
    bce = stable_bce(logits, targets)
    dice = soft_dice(logits, targets)
    return jnp.where(jnp.isfinite(bce), 0.5 * bce + dice, 2.0 * dice)


def _lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t. sorted errors (losses.py:19-31)."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted.astype(jnp.float32), axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted.astype(jnp.float32), axis=0)
    jaccard = 1.0 - intersection / union
    if p > 1:  # cover the 1-pixel case (losses.py:29-30)
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_hinge_flat(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Binary Lovász hinge on flat vectors (losses.py:95-112)."""
    signs = 2.0 * labels.astype(jnp.float32) - 1.0
    errors = 1.0 - logits.astype(jnp.float32) * signs
    # descending sort; argsort of -errors reproduces torch.sort(descending=True)
    perm = jnp.argsort(-errors)
    errors_sorted = errors[perm]
    gt_sorted = labels.astype(jnp.float32)[perm]
    grad = _lovasz_grad(gt_sorted)
    return jnp.dot(jax.nn.relu(errors_sorted), grad)


def lovasz_hinge(logits: jax.Array, labels: jax.Array, per_image: bool = True) -> jax.Array:
    """Binary Lovász hinge loss (losses.py:79-92, 305-314).

    Accepts (B, H, W) or (B, H, W, 1)/(B, 1, H, W); singleton channel axes
    are squeezed, matching LovaszHingeLoss.forward (losses.py:309-311).
    """
    if logits.ndim == 4:
        logits = logits.reshape(logits.shape[0], -1)
        labels = labels.reshape(labels.shape[0], -1)
    else:
        logits = logits.reshape(logits.shape[0], -1)
        labels = labels.reshape(labels.shape[0], -1)
    if per_image:
        losses = jax.vmap(_lovasz_hinge_flat)(logits, labels)
        return jnp.mean(losses)
    return _lovasz_hinge_flat(logits.reshape(-1), labels.reshape(-1))


def lovasz_hinge_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Registry entry 'LovaszHingeLoss' (losses.py:305-314): per-image hinge."""
    return lovasz_hinge(logits, labels, per_image=True)


def lovasz_softmax(probas: jax.Array, labels: jax.Array) -> jax.Array:
    """Multi-class Lovász-Softmax (losses.py:172-200), channels-last.

    probas: (..., C) class probabilities; labels: integer map (...,).
    Each class is weighted by its presence in ``labels`` and the result is
    the presence-weighted mean, matching classes='present' semantics without
    data-dependent shapes (required under jit).
    """
    C = probas.shape[-1]
    flat = probas.reshape(-1, C).astype(jnp.float32)
    lab = labels.reshape(-1)

    def per_class(c):
        fg = (lab == c).astype(jnp.float32)
        class_pred = flat[:, 0] if C == 1 else flat[:, c]
        errors = jnp.abs(fg - class_pred)
        perm = jnp.argsort(-errors)
        errors_sorted = errors[perm]
        fg_sorted = fg[perm]
        loss_c = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        present = (jnp.sum(fg) > 0).astype(jnp.float32)
        return loss_c * present, present

    losses, present = jax.vmap(per_class)(jnp.arange(C))
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(losses) / denom


def masked_l1_loss(inputs: jax.Array, targets: jax.Array, outputs: jax.Array) -> jax.Array:
    """Per-class masked-image L1 (losses.py:255-272), channels-last.

    inputs: (B, H, W, Cin) image; targets/outputs: (B, H, W, K) masks.
    For each class k, compares target-masked and output-masked images with
    mean-reduced L1, summing over classes.
    """
    inputs = inputs.astype(jnp.float32)
    num_class = targets.shape[-1]
    total = 0.0
    for k in range(num_class):
        gt_mask = targets[..., k : k + 1].astype(jnp.float32)
        ot_mask = outputs[..., k : k + 1].astype(jnp.float32)
        total = total + jnp.mean(jnp.abs(gt_mask * inputs - ot_mask * inputs))
    return total


# Registry: reference exposes these names via losses.__all__ (+ BCEWithLogitsLoss
# appended by the trainer, train.py:32-33) and looks them up by string
# (train.py:243-246).
LOSS_REGISTRY = {
    "BCEDiceLoss": bce_dice_loss,
    "LovaszHingeLoss": lovasz_hinge_loss,
    "BCEWithLogitsLoss": bce_with_logits_loss,
}

LOSS_NAMES = list(LOSS_REGISTRY)


def get_loss(name: str):
    if name not in LOSS_REGISTRY:
        raise KeyError(f"unknown loss {name!r}; available: {LOSS_NAMES}")
    return LOSS_REGISTRY[name]
