"""Jitted supervised train / eval steps.

One fused XLA program per step replaces the reference's per-batch hot loop
(train.py:79-120): forward, NaN scrub, loss, **on-device** IoU/Dice (the
reference syncs to host numpy every step, metrics.py:10-12 — hot-loop rank 4
in SURVEY.md §3), weight clamp, backward, optimizer update.  Under a
``data``-axis mesh the batch arrives sharded; every cross-batch reduction
(BN stats, loss, metrics, gradients) lowers to ICI collectives
automatically.

Reference quirks preserved deliberately (SURVEY.md §7 "hard parts" #3):

- ``output[isnan] = 0`` scrub before loss/metrics (train.py:100);
- metrics computed on channels 1..C-1 only (train.py:101-102);
- ``p.data.clamp_(-clip, clip)`` runs *after* the forward but *before* the
  optimizer step (train.py:111-116): gradients are taken at the unclamped
  weights, then updates apply to the clamped weights;
- deep supervision averages the loss over heads but scores the last head
  on **all** channels (train.py:84-95).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ssunet_gan_tpu.ops.metrics import dice_coef, foreground_slice, iou_score
from ssunet_gan_tpu.train.state import TrainState

Batch = Tuple[jax.Array, jax.Array]  # (image NHWC, target NHWC)


def _scrub_nan(x: jax.Array) -> jax.Array:
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def _forward_loss(
    model,
    loss_fn: Callable,
    num_classes: int,
    deep_supervision: bool,
    params,
    aux_vars: Dict[str, Any],
    mutable,
    image: jax.Array,
    target: jax.Array,
    train: bool,
):
    variables = {"params": params, **aux_vars}
    if mutable:
        out, updates = model.apply(variables, image, train, mutable=mutable)
    else:
        out, updates = model.apply(variables, image, train), {}

    if deep_supervision and isinstance(out, (list, tuple)):
        outs = [_scrub_nan(o) for o in out]
        loss = sum(loss_fn(o, target) for o in outs) / len(outs)
        iou = iou_score(outs[-1], target)
        dice = dice_coef(outs[-1], target)
    else:
        out = _scrub_nan(out)
        loss = loss_fn(out, target)
        out_m = foreground_slice(out, num_classes)
        tar_m = foreground_slice(target, num_classes)
        iou = iou_score(out_m, tar_m)
        dice = dice_coef(out_m, tar_m)
    metrics = {"loss": loss, "iou": iou, "dice": dice}
    return loss, (metrics, updates)


def make_train_step(
    model,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    num_classes: int,
    deep_supervision: bool = False,
    clip: float = 0.0,
    param_labels=None,
    accum_steps: int = 1,
    mesh=None,
    data_axis: str = "data",
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Dict[str, jax.Array]]]:
    """Build the jitted supervised train step ``(state, batch, lr) → (state, metrics)``.

    ``param_labels`` (optional) is a {'main', 'cnn'}-labelled tree matching
    the params; 'cnn' leaves scale by the step's ``lr_cnn`` argument instead
    of ``lr`` — the encoder dual-optimizer path ('effnet' in arch,
    train.py:274-301, 118-120).  The reference's version never actually
    trains the encoder (its cnn step runs on zeroed grads, SURVEY.md §7);
    this implements the evident intent.

    ``accum_steps`` > 1 splits the batch into that many microbatches scanned
    sequentially: gradients are averaged and applied in ONE optimizer update,
    so effective batches larger than HBM fit (extends the reference's fixed
    per-step batch, train.py:114-116). Live activations shrink to one
    microbatch. Equivalent to the full-batch step up to BatchNorm batch
    statistics (each microbatch normalizes with its own batch stats, and the
    running stats integrate sequentially — the same semantics as running k
    torch steps). The batch size must divide by ``accum_steps``; under a
    mesh each microbatch stays sharded over the ``data`` axis.

    ``mesh`` (optional): build the DP step as ``jax.shard_map`` over
    ``data_axis`` instead of relying on GSPMD. This is the multi-chip path
    for the fused train kernels (Pallas calls have no SPMD partitioning
    rule, so GSPMD can't shard them): each device traces the kernels on its
    LOCAL batch shard, and every cross-batch reduction — BN batch stats in
    both the module and the fused-kernel path, the BN-backward stat terms,
    metrics, gradients — goes through explicit collectives
    (ops/collectives.py). Semantics match the GSPMD composition step
    exactly: SyncBN stats/grads, global-mean loss, global IoU/Dice
    (parity-pinned in tests/test_parallel.py). Requires ``accum_steps == 1``.
    """
    if mesh is not None:
        if accum_steps != 1:
            raise ValueError("mesh= (shard_map DP) requires accum_steps == 1")
        return _make_train_step_shard_map(
            model, loss_fn, tx, num_classes, deep_supervision, clip,
            param_labels, mesh, data_axis,
        )

    def step(state: TrainState, batch: Batch, lr: jax.Array, lr_cnn: jax.Array = 0.0):
        image, target = batch
        aux = {}
        if state.batch_stats:
            aux["batch_stats"] = state.batch_stats
        if state.spectral:
            aux["spectral"] = state.spectral
        mutable = list(aux.keys())

        if accum_steps > 1:
            if image.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {image.shape[0]} not divisible by accum_steps={accum_steps}"
                )
            # interleaved split (microbatch j = rows j, k+j, 2k+j, ...): each
            # device's contiguous shard contributes equally to every
            # microbatch, so no cross-device resharding is needed
            image_m = jnp.swapaxes(
                image.reshape(-1, accum_steps, *image.shape[1:]), 0, 1
            )
            target_m = jnp.swapaxes(
                target.reshape(-1, accum_steps, *target.shape[1:]), 0, 1
            )

            def micro(aux_c, xt):
                img, tar = xt
                g_fn = jax.value_and_grad(
                    lambda p: _forward_loss(
                        model, loss_fn, num_classes, deep_supervision,
                        p, aux_c, mutable, img, tar, True,
                    ),
                    has_aux=True,
                )
                (_, (m, upd)), g = g_fn(state.params)
                new_aux = {k: upd.get(k, v) for k, v in aux_c.items()}
                return new_aux, (g, m)

            updates, (grads_m, metrics_m) = jax.lax.scan(
                micro, aux, (image_m, target_m)
            )
            grads = jax.tree_util.tree_map(lambda g: jnp.mean(g, axis=0), grads_m)
            metrics = {k: jnp.mean(v) for k, v in metrics_m.items()}
        else:
            grad_fn = jax.value_and_grad(
                lambda p: _forward_loss(
                    model, loss_fn, num_classes, deep_supervision,
                    p, aux, mutable, image, target, True,
                ),
                has_aux=True,
            )
            (_, (metrics, updates)), grads = grad_fn(state.params)

        # weight clamp before the update, gradients from unclamped weights
        # (train.py:111-116)
        params = state.params
        if clip and clip > 0:
            params = jax.tree_util.tree_map(lambda p: jnp.clip(p, -clip, clip), params)

        deltas, opt_state = tx.update(grads, state.opt_state, params)
        if param_labels is None:
            deltas = jax.tree_util.tree_map(lambda u: u * lr, deltas)
        else:
            deltas = jax.tree_util.tree_map(
                lambda u, lab: u * (lr_cnn if lab == "cnn" else lr),
                deltas, param_labels,
            )
        params = optax.apply_updates(params, deltas)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            spectral=updates.get("spectral", state.spectral),
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def _make_train_step_shard_map(
    model, loss_fn, tx, num_classes, deep_supervision, clip, param_labels,
    mesh, data_axis,
):
    """shard_map DP train step (see make_train_step's ``mesh`` docs).

    The body computes per-shard grads with the collectives context active
    (ops/collectives.train_axis — a trace-time switch the BN/metric/fused-
    kernel code keys on), then pmeans the gradient tree: with the loss
    decomposing as a mean of per-sample terms (stable_bce + per-sample
    soft_dice, ops/losses.py) and equal shard sizes, pmean-of-local-grads
    is EXACTLY the gradient of the global-mean loss — the stat-coupling
    cross terms ride the psums' transposes (autodiff) and the explicit
    psums in the fused stage's custom VJP. The optimizer update runs
    outside the shard_map on replicated values.
    """
    from jax.sharding import PartitionSpec
    from ssunet_gan_tpu.ops import collectives

    P = PartitionSpec
    axis_size = mesh.shape[data_axis]

    def step(state: TrainState, batch: Batch, lr: jax.Array, lr_cnn: jax.Array = 0.0):
        image, target = batch
        aux = {}
        if state.batch_stats:
            aux["batch_stats"] = state.batch_stats
        if state.spectral:
            aux["spectral"] = state.spectral
        mutable = list(aux.keys())

        def body(params, aux_c, img, tar):
            with collectives.train_axis(data_axis, axis_size):
                grad_fn = jax.value_and_grad(
                    lambda p: _forward_loss(
                        model, loss_fn, num_classes, deep_supervision,
                        p, aux_c, mutable, img, tar, True,
                    ),
                    has_aux=True,
                )
                (_, (metrics, updates)), grads = grad_fn(params)
            grads = jax.lax.pmean(grads, data_axis)
            # loss: pmean of local means = global mean (equal shards);
            # iou/dice were already computed from psummed global sums
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, data_axis), metrics
            )
            # updates (BN running stats) come from global batch stats, so
            # they are shard-identical and replicate cleanly
            return grads, metrics, updates

        grads, metrics, updates = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P(data_axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state.params, aux, image, target)

        params = state.params
        if clip and clip > 0:
            params = jax.tree_util.tree_map(lambda p: jnp.clip(p, -clip, clip), params)

        deltas, opt_state = tx.update(grads, state.opt_state, params)
        if param_labels is None:
            deltas = jax.tree_util.tree_map(lambda u: u * lr, deltas)
        else:
            deltas = jax.tree_util.tree_map(
                lambda u, lab: u * (lr_cnn if lab == "cnn" else lr),
                deltas, param_labels,
            )
        params = optax.apply_updates(params, deltas)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            spectral=updates.get("spectral", state.spectral),
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(
    model,
    loss_fn: Callable,
    num_classes: int,
    deep_supervision: bool = False,
) -> Callable[[TrainState, Batch], Dict[str, jax.Array]]:
    """Build the jitted eval step (validate(), train.py:141-190): running BN
    stats, no state mutation."""

    def step(state: TrainState, batch: Batch):
        image, target = batch
        aux = {}
        if state.batch_stats:
            aux["batch_stats"] = state.batch_stats
        if state.spectral:
            aux["spectral"] = state.spectral
        _, (metrics, _) = _forward_loss(
            model, loss_fn, num_classes, deep_supervision,
            state.params, aux, [], image, target, False,
        )
        return metrics

    return jax.jit(step)


def make_predict_fn(model) -> Callable:
    """Jitted inference forward: logits in eval mode."""

    def predict(variables, image: jax.Array) -> jax.Array:
        return model.apply(variables, image, False)

    return jax.jit(predict)
