"""Jitted alternating G/D adversarial train step.

One fused XLA program reproduces the reference's per-batch GAN iteration
(train_seg_gan.py:167-233) with no host synchronization:

G phase (train_seg_gan.py:188-215):
  g_out = G(input); NaN scrub; seg loss = criterion(g_out, target);
  content = MSE(g_out, target); adv = BCE(D(g_out), 1);
  perceptual = seg + α·content + β·adv  (α=1e-4, β=1e-3,
  train_seg_gan.py:172-173); gradients **value-clipped** to ±0.8
  (clip_gradient, srgan_utils.py:186-195); Adam update.
  Gradients flow into G *through* D (D params constant), exactly as torch's
  ``optimizer_g.step()`` after a joint backward.

D phase (train_seg_gan.py:217-233):
  BCE(D(target), 1) + BCE(D(stop_grad(g_out)), 0) on the PRE-update
  generator output (the reference reuses ``generator_output``), value-clip
  ±0.8, Adam update.

D's BatchNorm running stats update three times per iteration in reference
order — D(g_out) during the G phase, then D(target), then D(g_out.detach())
— preserved by threading the ``batch_stats`` collection through the three
applications.

Metrics logged are the *segmentation* loss + fg IoU/Dice
(train_seg_gan.py:194-199), not the perceptual loss.

``mesh=`` builds the step as ``jax.shard_map`` over the data axis — the
multi-chip path for the fused train kernels inside G (see
train/step.py ``mesh=`` / ops/collectives.py): both grad phases run on the
local batch shard with explicit SyncBN collectives, the gradient trees are
pmean'd (exact global-mean-loss gradients — every loss term is a
per-sample mean), and the reference's value-clips + Adam updates apply
outside on the replicated grads, exactly as GSPMD would order them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ssunet_gan_tpu.ops.losses import bce_with_logits_loss
from ssunet_gan_tpu.ops.metrics import dice_coef, foreground_slice, iou_score
from ssunet_gan_tpu.train.state import TrainState

# Joint-scalar GAN gradient (shared fake forward) vs the alternating
# two-grad structure — default ON; set_joint_gan(False) restores the
# alternating formulation for A/B (always used when D carries spectral
# power-iteration state).
_JOINT_GAN = True


def set_joint_gan(enabled: bool) -> None:
    global _JOINT_GAN
    _JOINT_GAN = bool(enabled)


ALPHA = 1e-4  # content (MSE) weight, train_seg_gan.py:172
BETA = 1e-3  # adversarial weight, train_seg_gan.py:173
GRAD_CLIP = 0.8  # train_seg_gan.py:174


def _mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def _clip_grads(grads, clip: float):
    """Per-element grad value clamp (clip_gradient, srgan_utils.py:186-195)."""
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip, clip), grads)


def _apply(model, params, aux, x, train, mutable):
    variables = {"params": params, **aux}
    if mutable:
        return model.apply(variables, x, train, mutable=mutable)
    return model.apply(variables, x, train), {}


def make_gan_train_step(
    generator,
    discriminator,
    seg_loss_fn: Callable,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    num_classes: int,
    alpha: float = ALPHA,
    beta: float = BETA,
    grad_clip: float = GRAD_CLIP,
    mesh=None,
    data_axis: str = "data",
):
    """Build the jitted GAN step ``(g_state, d_state, batch, lr) →
    (g_state, d_state, metrics)``. ``mesh=`` → shard_map DP (module docs)."""

    def _grads_joint(g_params, d_params, g_aux, d_aux, g_mutable, d_mutable,
                     image, target):
        """Both phases as ONE gradient over a routed joint scalar (r5).

        The alternating formulation forwards D over the SAME fake batch
        twice (G phase + D phase, ~1 D-forward of pure recompute) and runs
        two full backward traversals. Since train-mode BatchNorm's
        activations never depend on the running stats, the two fake
        forwards are value-identical — so the joint scalar

            perceptual(θg; D(sg(θd), g_out))          [adv grads → G only]
          + BCE(D(θd, target), 1) + BCE(D(θd, sg(g_out)), 0)   [→ D only]

        differentiated once wrt (θg, θd) yields EXACTLY the reference's two
        phase gradients (stop_gradients route each term), while XLA CSEs
        the duplicated fake primal and each backward is pruned to its live
        path. The reference's THIRD running-stat update (fake after real,
        train_seg_gan.py:217-233) is reconstructed arithmetically: the
        fake batch's stats b satisfy upd1 = 0.9·ra0 + 0.1·b, so
        upd3 = 0.9·upd2 + 0.1·b — same values up to one f32 division.

        Only valid when D carries no per-forward iterated state (spectral
        u/v would iterate 3× in the reference); callers gate on that.
        """

        def joint_loss(both):
            gp, dp = both
            g_out, g_updates = _apply(generator, gp, g_aux, image, True, g_mutable)
            g_out = jnp.where(jnp.isnan(g_out), jnp.zeros_like(g_out), g_out)
            seg_loss = seg_loss_fn(g_out, target)
            content = _mse(g_out, target)
            dp_const = jax.lax.stop_gradient(dp)
            d_fake_g, d_updates1 = _apply(
                discriminator, dp_const, d_aux, g_out, True, d_mutable
            )
            adv = bce_with_logits_loss(d_fake_g, jnp.ones_like(d_fake_g))
            perceptual = seg_loss + alpha * content + beta * adv

            d_aux2 = dict(d_aux)
            if "batch_stats" in d_updates1:
                d_aux2["batch_stats"] = d_updates1["batch_stats"]
            tgt = target.astype(image.dtype)
            d_real, d_updates2 = _apply(
                discriminator, dp, d_aux2, tgt, True, d_mutable
            )
            g_out_sg = jax.lax.stop_gradient(g_out)
            d_fake_d, _ = _apply(
                discriminator, dp, d_aux2, g_out_sg, True, d_mutable
            )
            d_loss = bce_with_logits_loss(
                d_fake_d, jnp.zeros_like(d_fake_d)
            ) + bce_with_logits_loss(d_real, jnp.ones_like(d_real))

            # reconstruct the reference's 3rd running-stat update (fake
            # AFTER real): b = (upd1 − 0.9·ra0)/0.1; upd3 = 0.9·upd2 + 0.1·b
            d_updates3 = dict(d_updates2)
            if "batch_stats" in d_updates2:
                d_updates3["batch_stats"] = jax.tree_util.tree_map(
                    lambda u2, u1, r0: 0.9 * u2 + (u1 - 0.9 * r0),
                    d_updates2["batch_stats"], d_updates1["batch_stats"],
                    d_aux["batch_stats"],
                )
            out_m = foreground_slice(g_out, num_classes)
            tar_m = foreground_slice(target, num_classes)
            metrics = {
                "loss": seg_loss,
                "iou": iou_score(out_m, tar_m),
                "dice": dice_coef(out_m, tar_m),
                "perceptual_loss": perceptual,
                "adv_loss": adv,
                "d_loss": d_loss,
            }
            return perceptual + d_loss, (g_updates, d_updates3, metrics)

        (g_grads, d_grads), (g_updates, d_updates3, metrics) = jax.grad(
            joint_loss, has_aux=True
        )((g_params, d_params))
        return g_grads, d_grads, g_updates, d_updates3, metrics

    def _grads(g_params, d_params, g_aux, d_aux, g_mutable, d_mutable,
               image, target):
        """Both grad phases on (this shard of) the batch; no state updates.

        D grads use the PRE-update generator output and PRE-update D params
        (reference order), so neither phase depends on the other's update —
        the optimizer steps can apply outside on replicated grads.

        The joint-scalar formulation (:func:`_grads_joint`, shared fake
        forward) runs whenever D carries no spectral power-iteration state;
        the alternating two-grad structure below is the fallback that
        preserves per-forward u/v iteration counts exactly.
        """
        if _JOINT_GAN and "spectral" not in d_mutable:
            return _grads_joint(g_params, d_params, g_aux, d_aux,
                                g_mutable, d_mutable, image, target)

        # ---- G phase ----------------------------------------------------
        def g_loss_fn(g_params):
            g_out, g_updates = _apply(generator, g_params, g_aux, image, True, g_mutable)
            g_out = jnp.where(jnp.isnan(g_out), jnp.zeros_like(g_out), g_out)
            seg_loss = seg_loss_fn(g_out, target)
            content = _mse(g_out, target)
            # D in train mode; its batch_stats mutate (first of three updates)
            d_fake, d_updates1 = _apply(
                discriminator, d_params, d_aux, g_out, True, d_mutable
            )
            adv = bce_with_logits_loss(d_fake, jnp.ones_like(d_fake))
            perceptual = seg_loss + alpha * content + beta * adv
            out_m = foreground_slice(g_out, num_classes)
            tar_m = foreground_slice(target, num_classes)
            metrics = {
                "loss": seg_loss,
                "iou": iou_score(out_m, tar_m),
                "dice": dice_coef(out_m, tar_m),
                "perceptual_loss": perceptual,
                "adv_loss": adv,
            }
            return perceptual, (g_out, g_updates, d_updates1, metrics)

        g_grads, (g_out, g_updates, d_updates1, metrics) = jax.grad(
            g_loss_fn, has_aux=True
        )(g_params)

        # ---- D phase (pre-update generator output, reference order) -----
        d_aux2 = dict(d_aux)
        if "batch_stats" in d_updates1:
            d_aux2["batch_stats"] = d_updates1["batch_stats"]
        if "spectral" in d_updates1:
            d_aux2["spectral"] = d_updates1["spectral"]
        g_out_sg = jax.lax.stop_gradient(g_out)

        def d_loss_fn(d_params):
            # D sees the training activation dtype: the reference feeds
            # torch f32 everywhere, but under mixed precision g_out (and
            # therefore D's fake branch) is bf16 — an f32 real branch
            # would silently run D's convs at half the MXU rate. In f32
            # training this cast is a no-op.
            d_real, d_updates2 = _apply(
                discriminator, d_params, d_aux2,
                target.astype(image.dtype), True, d_mutable
            )
            d_aux3 = dict(d_aux2)
            d_aux3.update(d_updates2)
            d_fake, d_updates3 = _apply(
                discriminator, d_params, d_aux3, g_out_sg, True, d_mutable
            )
            d_loss = bce_with_logits_loss(
                d_fake, jnp.zeros_like(d_fake)
            ) + bce_with_logits_loss(d_real, jnp.ones_like(d_real))
            return d_loss, d_updates3

        (d_loss, d_updates3), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_params
        )
        metrics["d_loss"] = d_loss
        return g_grads, d_grads, g_updates, d_updates3, metrics

    def step(g_state: TrainState, d_state: TrainState, batch, lr: jax.Array):
        image, target = batch

        g_aux = {}
        if g_state.batch_stats:
            g_aux["batch_stats"] = g_state.batch_stats
        if g_state.spectral:
            g_aux["spectral"] = g_state.spectral
        g_mutable = list(g_aux.keys())
        d_aux = {}
        if d_state.batch_stats:
            d_aux["batch_stats"] = d_state.batch_stats
        if d_state.spectral:
            d_aux["spectral"] = d_state.spectral
        d_mutable = list(d_aux.keys())

        if mesh is None:
            g_grads, d_grads, g_updates, d_updates3, metrics = _grads(
                g_state.params, d_state.params, g_aux, d_aux,
                g_mutable, d_mutable, image, target,
            )
        else:
            from jax.sharding import PartitionSpec as P

            from ssunet_gan_tpu.ops import collectives

            axis_size = mesh.shape[data_axis]

            def body(g_params, d_params, g_aux_c, d_aux_c, img, tar):
                with collectives.train_axis(data_axis, axis_size):
                    g_grads, d_grads, g_upd, d_upd, metrics = _grads(
                        g_params, d_params, g_aux_c, d_aux_c,
                        g_mutable, d_mutable, img, tar,
                    )
                g_grads = jax.lax.pmean(g_grads, data_axis)
                d_grads = jax.lax.pmean(d_grads, data_axis)
                metrics = jax.tree_util.tree_map(
                    lambda m: jax.lax.pmean(m, data_axis), metrics
                )
                # BN running stats / spectral states come from global
                # reductions (collectives ctx), so they replicate cleanly
                return g_grads, d_grads, g_upd, d_upd, metrics

            g_grads, d_grads, g_updates, d_updates3, metrics = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(data_axis), P(data_axis)),
                out_specs=(P(), P(), P(), P(), P()),
                check_vma=False,
            )(g_state.params, d_state.params, g_aux, d_aux, image, target)

        g_grads = _clip_grads(g_grads, grad_clip)
        g_deltas, g_opt_state = tx_g.update(g_grads, g_state.opt_state, g_state.params)
        g_deltas = jax.tree_util.tree_map(lambda u: u * lr, g_deltas)
        g_params = optax.apply_updates(g_state.params, g_deltas)
        g_state = g_state.replace(
            step=g_state.step + 1,
            params=g_params,
            opt_state=g_opt_state,
            batch_stats=g_updates.get("batch_stats", g_state.batch_stats),
            spectral=g_updates.get("spectral", g_state.spectral),
        )

        d_grads = _clip_grads(d_grads, grad_clip)
        d_deltas, d_opt_state = tx_d.update(d_grads, d_state.opt_state, d_state.params)
        d_deltas = jax.tree_util.tree_map(lambda u: u * lr, d_deltas)
        d_params = optax.apply_updates(d_state.params, d_deltas)
        d_state = d_state.replace(
            step=d_state.step + 1,
            params=d_params,
            opt_state=d_opt_state,
            batch_stats=d_updates3.get("batch_stats", d_state.batch_stats),
            spectral=d_updates3.get("spectral", d_state.spectral),
        )

        return g_state, d_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
