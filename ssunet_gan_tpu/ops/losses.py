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


def _lovasz_softmax_flat(flat: jax.Array, lab: jax.Array, class_list,
                         require_present: bool, valid: jax.Array) -> jax.Array:
    """Lovász-Softmax on flat (P, C) probabilities (losses.py:172-200).

    ``valid`` masks void pixels: their errors are forced to -inf so they sort
    past every real pixel, contribute relu(-inf)=0 to the dot product, and
    only occupy tail positions of the cumsums — numerically identical to the
    reference's shape-changing filter, but jittable.
    """
    C = flat.shape[1]

    def per_class(c):
        fg = jnp.logical_and(lab == c, valid).astype(jnp.float32)
        class_pred = flat[:, 0] if C == 1 else flat[:, c]
        errors = jnp.where(valid, jnp.abs(fg - class_pred), -jnp.inf)
        perm = jnp.argsort(-errors)
        errors_sorted = jax.nn.relu(errors[perm])
        fg_sorted = fg[perm]
        loss_c = jnp.dot(errors_sorted, _lovasz_grad(fg_sorted))
        if require_present:
            present = (jnp.sum(fg) > 0).astype(jnp.float32)
        else:
            present = jnp.float32(1.0)
        return loss_c * present, present

    losses, present = jax.vmap(per_class)(jnp.asarray(class_list))
    denom = jnp.maximum(jnp.sum(present), 1.0)
    return jnp.sum(losses) / denom


def lovasz_softmax(probas: jax.Array, labels: jax.Array, classes="present",
                   per_image: bool = False, ignore=None) -> jax.Array:
    """Multi-class Lovász-Softmax (losses.py:154-200), channels-last.

    probas: (..., C) class probabilities; labels: integer map (...,).
    ``classes``: 'present' weights each class by its presence in ``labels``
    (jit-compatible equivalent of the reference's data-dependent skip),
    'all' averages every class, or an explicit class list.  ``per_image``
    computes the loss per batch element and averages.  ``ignore`` marks a
    void label value excluded from the loss (losses.py:154-170).
    """
    C = probas.shape[-1]
    if classes in ("all", "present"):
        class_list = list(range(C))
        require_present = classes == "present"
    else:
        class_list = list(classes)
        require_present = False

    def flat_loss(p, l):
        p2 = p.reshape(-1, C).astype(jnp.float32)
        l1 = l.reshape(-1)
        valid = jnp.ones_like(l1, bool) if ignore is None else (l1 != ignore)
        return _lovasz_softmax_flat(p2, l1, class_list, require_present, valid)

    if per_image:
        b = probas.shape[0]
        return jnp.mean(
            jax.vmap(flat_loss)(probas.reshape(b, -1, C), labels.reshape(b, -1))
        )
    return flat_loss(probas, labels)


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


def binary_xloss(logits: jax.Array, labels: jax.Array, ignore=None) -> jax.Array:
    """Binary cross-entropy on logits with optional void label
    (losses.py:139-151).

    The reference filters void pixels out before StableBCELoss; the masked
    mean below (sum over valid / count of valid) is numerically identical
    and jittable.
    """
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1)
    neg_abs = -jnp.abs(logits)
    loss = (
        jnp.clip(logits, min=0)
        - logits * labels.astype(jnp.float32)
        + jnp.log1p(jnp.exp(neg_abs))
    )
    if ignore is None:
        return jnp.mean(loss)
    valid = (labels != ignore).astype(jnp.float32)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def xloss(logits: jax.Array, labels: jax.Array, ignore=None) -> jax.Array:
    """Multi-class cross-entropy, channels-last logits (losses.py:221-226).

    Reference quirk preserved: its ``ignore`` argument is accepted but
    UNUSED — it always passes ``ignore_index=255`` to F.cross_entropy.
    """
    del ignore  # accepted-but-unused, exactly like the reference
    C = logits.shape[-1]
    flat = logits.reshape(-1, C).astype(jnp.float32)
    lab = labels.reshape(-1)
    valid = (lab != 255).astype(jnp.float32)
    logp = jax.nn.log_softmax(flat, axis=-1)
    picked = jnp.take_along_axis(
        logp, jnp.clip(lab, 0, C - 1).reshape(-1, 1), axis=1
    )[:, 0]
    return -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def iou_binary(preds: jax.Array, labels: jax.Array, EMPTY: float = 1.0,
               ignore=None, per_image: bool = True) -> jax.Array:
    """100·IoU of the foreground class (losses.py:34-51)."""
    if not per_image:
        preds = preds.reshape(1, -1)
        labels = labels.reshape(1, -1)
    b = preds.shape[0]
    preds = preds.reshape(b, -1)
    labels = labels.reshape(b, -1)
    inter = jnp.sum(jnp.logical_and(labels == 1, preds == 1), axis=1)
    pred_fg = (preds == 1) if ignore is None else jnp.logical_and(
        preds == 1, labels != ignore
    )
    union = jnp.sum(jnp.logical_or(labels == 1, pred_fg), axis=1)
    iou_img = jnp.where(union > 0, inter / jnp.maximum(union, 1), EMPTY)
    return 100.0 * jnp.mean(iou_img)


def iou(preds: jax.Array, labels: jax.Array, C: int, EMPTY: float = 1.0,
        ignore=None, per_image: bool = False) -> jax.Array:
    """100·IoU per (non-ignored) class (losses.py:54-77); returns an array of
    length C (or C-1 when ``ignore`` names a class in range).

    Reference bug fixed here: its ``iou`` calls ``np.array`` without ever
    importing numpy, so it raises NameError when invoked (losses.py:77).
    """
    if not per_image:
        preds = preds.reshape(1, -1)
        labels = labels.reshape(1, -1)
    b = preds.shape[0]
    preds = preds.reshape(b, -1)
    labels = labels.reshape(b, -1)
    classes = [i for i in range(C) if i != ignore]

    def one_class(i):
        inter = jnp.sum(jnp.logical_and(labels == i, preds == i), axis=1)
        pred_i = (preds == i) if ignore is None else jnp.logical_and(
            preds == i, labels != ignore
        )
        union = jnp.sum(jnp.logical_or(labels == i, pred_i), axis=1)
        return jnp.where(union > 0, inter / jnp.maximum(union, 1), EMPTY)

    per_cls = jax.vmap(one_class)(jnp.asarray(classes))  # (n_classes, B)
    return 100.0 * jnp.mean(per_cls, axis=1)


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
