"""Supervised trainer — the reference's ``train.py`` as a TPU-native CLI.

    python -m ssunet_gan_tpu.train.supervised --config configs/config_v1.json

Experiment management parity (train.py:195-469):
- 3-section JSON config with string-bool coercion, auto model name;
- per-model ``config.yml`` card dumped next to the weights (train.py:239-240);
- TensorBoard scalars — {train,val,test}×{loss,iou,dice} per epoch
  (train.py:44-53) — and a pandas ``log.csv`` (train.py:406-415,454);
- best checkpoint by **val IoU** (train.py:458-462), early stopping
  (train.py:465-467), Best_dice/iou_AtBestDice tracking on the test split;
- scheduler stepped per epoch, SGD only (train.py:426-432).

TPU-native differences (SURVEY.md §7):
- one jitted train step per batch over a ``data``-axis mesh (no
  DataParallel, no SyncBN runtime);
- metrics accumulate **on device**; the host syncs once per epoch instead
  of every step (the reference's hot-loop rank-4 bottleneck);
- checkpoints are orbax state (params + BN stats + optimizer + epoch) with
  working resume — the reference's resume is dead code (train.py:260-269).
"""

from __future__ import annotations

import argparse
import os
import time
from collections import OrderedDict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ssunet_gan_tpu.config import ExperimentConfig, dump_model_card, load_experiment_config
from ssunet_gan_tpu.data.dataset import SegmentationDataset, SyntheticDataset, list_split_ids
from ssunet_gan_tpu.data.loader import BatchLoader
from ssunet_gan_tpu.data.transforms import train_transform, val_transform
from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.ops.losses import get_loss
from ssunet_gan_tpu.parallel import make_mesh, replicate, shard_batch
from ssunet_gan_tpu.train import checkpoint as ckpt
from ssunet_gan_tpu.train.optim import build_optimizer, build_scheduler
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_eval_step, make_train_step
from ssunet_gan_tpu.utils import count_params, jit_init, seed_everything


def parse_args():
    parser = argparse.ArgumentParser(description="supervised segmentation trainer")
    parser.add_argument("--config", default=None, required=True, help="config file")
    return parser.parse_args()


def _epoch_mean(metric_list) -> Dict[str, float]:
    """Sync a list of on-device metric dicts once (per epoch)."""
    if not metric_list:
        return {"loss": 0.0, "iou": 0.0, "dice": 0.0}
    stacked = {k: jnp.stack([m[k] for m in metric_list]) for k in metric_list[0]}
    host = jax.device_get(stacked)
    return {k: float(np.mean(v)) for k, v in host.items()}


def save_tensorboard(writer, train_log, val_log, test_log, epoch):
    """9 scalars per epoch (train.py:44-53)."""
    if writer is None:
        return
    for split, log in (("train", train_log), ("val", val_log), ("test", test_log)):
        writer.add_scalar(f"loss/{split}_loss", log["loss"], epoch)
        writer.add_scalar(f"iou/{split}_iou", log["iou"], epoch)
        writer.add_scalar(f"dice/{split}_dice", log["dice"], epoch)


def build_datasets(cfg: ExperimentConfig, synthetic: Optional[int] = None):
    """Train/val/test datasets per the directory convention (train.py:356-385).

    ``synthetic=N`` substitutes deterministic in-memory scenes (tests/bench).
    """
    config = cfg.opt_config
    if synthetic:
        mk = lambda n, tf, seed: SyntheticDataset(  # noqa: E731
            n, config["input_h"], config["input_w"], config["num_classes"],
            config["input_channels"], transform=tf, seed=seed,
        )
        return (
            mk(synthetic, train_transform(config), 1),
            mk(max(synthetic // 4, 1), val_transform(config), 2),
            mk(max(synthetic // 4, 1), val_transform(config), 3),
        )
    input_folder = cfg.file_path.input_path
    sets = []
    for split, ds_key, tf in (
        ("training", "dataset", train_transform(config)),
        ("validation", "val_dataset", val_transform(config)),
        ("test", "val_dataset", val_transform(config)),
    ):
        name = config[ds_key]
        ids = list_split_ids(input_folder, name, split, config["img_ext"])
        sets.append(
            SegmentationDataset(
                img_ids=ids,
                img_dir=os.path.join(input_folder, name, "images", split),
                mask_dir=os.path.join(input_folder, name, "annotations", split),
                img_ext=config["img_ext"],
                mask_ext=config["mask_ext"],
                num_classes=config["num_classes"],
                input_channels=config["input_channels"],
                transform=tf,
            )
        )
    return tuple(sets)


def train_one_epoch(epoch, config, loader, mesh, state, train_step, lr,
                    eff_flag: bool = False):
    meters = []
    t0 = time.time()
    n_images = 0
    # encoder fine-tuning kicks in after epoch 1 (train.py:118-120)
    lr_cnn = jnp.float32(1e-3 if (eff_flag and epoch > 1) else 0.0)
    # bf16 activations (params/BN stats/loss stay f32): every op follows the
    # input dtype, so mixed precision is just an input cast
    img_dtype = jnp.bfloat16 if config.get("mixed_precision") else jnp.float32
    for _, img, mask, _ in loader:
        batch = shard_batch(
            mesh, (jnp.asarray(img, img_dtype), jnp.asarray(mask))
        )
        state, metrics = train_step(state, batch, jnp.float32(lr), lr_cnn)
        meters.append(metrics)
        n_images += img.shape[0]
        # keep at most 2 steps in flight: preserves dispatch/compute overlap
        # on TPU while preventing unbounded async pile-up (which starves the
        # 40s collective rendezvous on oversubscribed CPU test meshes)
        if len(meters) >= 2:
            jax.block_until_ready(meters[-2])
    log = _epoch_mean(meters)
    dt = time.time() - t0
    log["images_per_sec"] = n_images / max(dt, 1e-9)
    return state, log


def evaluate(config, loader, mesh, state, eval_step):
    meters = []
    for _, img, mask, _ in loader:
        batch = replicate(mesh, (jnp.asarray(img), jnp.asarray(mask)))
        meters.append(eval_step(state, batch))
        if len(meters) >= 2:
            jax.block_until_ready(meters[-2])
    return _epoch_mean(meters)


def run_experiment(
    cfg: ExperimentConfig,
    synthetic: Optional[int] = None,
    epochs_override: Optional[int] = None,
    mesh=None,
    use_tensorboard: bool = True,
):
    """Full experiment loop; returns (state, best_iou, log_frame)."""
    config = cfg.opt_config
    model_folder = cfg.file_path.model_path
    checkpoint_folder = cfg.file_path.checkpoint_path
    model_dir = os.path.join(model_folder, config["name"])
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(checkpoint_folder, exist_ok=True)

    writer = None
    if use_tensorboard:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=os.path.join(checkpoint_folder, config["name"]))
        except Exception:
            writer = None

    print("-" * 20)
    for key in config:
        print("%s: %s" % (key, config[key]))
    print("-" * 20)
    dump_model_card(config, model_dir)

    loss_fn = get_loss(config["loss"])
    if config.get("remat"):
        from ssunet_gan_tpu.ops.blocks import set_remat

        set_remat(True)
    if "fused_spade" in config:
        from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade

        set_fused_spade(bool(config["fused_spade"]))
    model = build_model(
        config["arch"], config["num_classes"], config["input_channels"],
        config["deep_supervision"],
    )

    mesh = mesh or make_mesh()
    root_key = seed_everything()
    sample = jnp.zeros(
        (1, config["input_h"], config["input_w"], config["input_channels"]), jnp.float32
    )
    variables = jit_init(model, root_key, sample, train=True)
    eff_flag = "effnet" in config["arch"]  # train.py:273-278
    if eff_flag:
        import optax

        from ssunet_gan_tpu.train.optim import build_cnn_optimizer, encoder_param_labels

        param_labels = encoder_param_labels(variables["params"])
        tx = optax.multi_transform(
            {"main": build_optimizer(config), "cnn": build_cnn_optimizer(config)},
            param_labels,
        )
    else:
        param_labels = None
        tx = build_optimizer(config)
    state = TrainState.create(variables, tx)
    state = replicate(mesh, state)
    print("=> creating model %s (%d params)" % (config["arch"], count_params(state.params)))

    scheduler = build_scheduler(config)
    # 'accum_steps' splits each batch into k sequentially-scanned microbatches
    # with one optimizer update — effective batches beyond HBM capacity.
    accum_steps = int(config.get("accum_steps", 1) or 1)
    # 'fused_train_dp' (opt-in card key): build the step as shard_map over
    # the mesh so the fused train kernels run on multi-chip DP (explicit
    # SyncBN collectives — train/step.py mesh=..., ops/collectives.py);
    # default GSPMD (identical semantics, composition kernels)
    fused_dp = bool(config.get("fused_train_dp", False)) and accum_steps == 1
    train_step = make_train_step(
        model, loss_fn, tx, config["num_classes"], config["deep_supervision"],
        clip=float(config.get("clip", 0.0) or 0.0), param_labels=param_labels,
        accum_steps=accum_steps, mesh=mesh if fused_dp else None,
    )
    eval_step = make_eval_step(
        model, loss_fn, config["num_classes"], config["deep_supervision"]
    )

    train_ds, val_ds, test_ds = build_datasets(cfg, synthetic)
    n_data = mesh.shape["data"]
    # each microbatch must itself shard over the data axis
    quantum = n_data * accum_steps
    batch_size = max(config["batch_size"] // quantum * quantum, quantum)
    num_workers = int(config.get("num_workers", 3))
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                               num_workers=num_workers)
    val_loader = BatchLoader(val_ds, 1, num_workers=num_workers)
    test_loader = BatchLoader(test_ds, 1, num_workers=num_workers)

    start_epoch = 0
    best_iou = 0.0
    if config.get("resume") and ckpt.has_train_state(model_dir):
        state, meta = ckpt.restore_train_state(model_dir, state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_iou = float(meta.get("best_iou", 0.0))
        print(f"=> resumed from epoch {start_epoch} (best_iou {best_iou:.4f})")

    log = OrderedDict(
        (k, [])
        for k in ("epoch", "lr", "loss", "iou", "dice", "val_loss", "val_iou", "val_dice")
    )
    trigger = 0
    best_dice = 0.0
    iou_at_best_dice = 0.0
    epochs = epochs_override if epochs_override is not None else config["epochs"]

    # 'profile_epoch': capture a jax.profiler device trace of that epoch
    # into <checkpoint>/<name>/profile (TensorBoard 'profile' tab) — the
    # reference has no profiling at all (SURVEY.md §5)
    profile_epoch = config.get("profile_epoch", -1)

    for epoch in range(start_epoch, epochs):
        print("{:s} Epoch [{:d}/{:d}]".format(config["arch"], epoch, epochs))
        lr = scheduler.lr(epoch)
        print("learning rate {:d}: {:f}".format(epoch, lr))
        if epoch == profile_epoch:
            from ssunet_gan_tpu.profiling import trace

            with trace(os.path.join(checkpoint_folder, config["name"], "profile")):
                state, train_log = train_one_epoch(
                    epoch, config, train_loader, mesh, state, train_step, lr, eff_flag
                )
        else:
            state, train_log = train_one_epoch(
                epoch, config, train_loader, mesh, state, train_step, lr, eff_flag
            )
        val_log = evaluate(config, val_loader, mesh, state, eval_step)
        scheduler.step_plateau(val_log["loss"])
        test_log = evaluate(config, test_loader, mesh, state, eval_step)

        if best_dice < test_log["dice"]:
            best_dice = test_log["dice"]
            iou_at_best_dice = test_log["iou"]
        print(
            "loss %.4f - iou %.4f - dice %.4f - val_loss %.4f - val_iou %.4f - "
            "val_dice %.4f - test_iou %.4f - test_dice %.4f - Best_dice %.4f - "
            "iou_AtBestDice %.4f (%.1f img/s)"
            % (
                train_log["loss"], train_log["iou"], train_log["dice"],
                val_log["loss"], val_log["iou"], val_log["dice"],
                test_log["iou"], test_log["dice"], best_dice, iou_at_best_dice,
                train_log["images_per_sec"],
            )
        )
        save_tensorboard(writer, train_log, val_log, test_log, epoch)

        log["epoch"].append(epoch)
        log["lr"].append(lr)
        log["loss"].append(train_log["loss"])
        log["iou"].append(train_log["iou"])
        log["dice"].append(train_log["dice"])
        log["val_loss"].append(val_log["loss"])
        log["val_iou"].append(val_log["iou"])
        log["val_dice"].append(val_log["dice"])
        pd.DataFrame(log).to_csv(os.path.join(model_dir, "log.csv"), index=False)

        trigger += 1
        if val_log["iou"] > best_iou:
            ckpt.save_model(model_dir, jax.device_get(state.variables()))
            best_iou = val_log["iou"]
            print("=> saved best model")
            trigger = 0
        ckpt.save_train_state(
            model_dir, jax.device_get(state), epoch, {"best_iou": best_iou}
        )

        if config.get("early_stopping", -1) >= 0 and trigger >= config["early_stopping"]:
            print("=> early stopping")
            break

    if writer is not None:
        writer.close()
    return state, best_iou, pd.DataFrame(log)


def main():
    args = parse_args()
    cfg = load_experiment_config(args.config)
    run_experiment(cfg)


if __name__ == "__main__":
    main()
