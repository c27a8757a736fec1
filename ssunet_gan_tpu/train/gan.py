"""GAN trainer — the reference's ``train_seg_gan.py`` as a TPU-native CLI.

    python -m ssunet_gan_tpu.train.gan --config configs/config_v1.json

Parity with train_seg_gan.py:297-539:
- generator rebuilt from the supervised model's ``config.yml`` card
  (``generator_name``, train_seg_gan.py:445-447) and **warm-started** from
  its checkpoint with strict=False semantics (models_seg_gan.py:216-233);
  reference torch ``model.pth`` files are also accepted;
- SRGAN discriminator (C classes in, k=3, 64 ch, 8 blocks, fc 1024,
  train_seg_gan.py:458-466);
- both optimizers Adam at ``gan_lr`` (train_seg_gan.py:452,468);
- fused jitted G/D step (α=1e-4 content, β=1e-3 adversarial, grad value
  clip 0.8) — see :mod:`ssunet_gan_tpu.train.gan_step`;
- best generator saved by **test** IoU (train_seg_gan.py:528-530).

Reference bugs NOT reproduced (SURVEY.md §7 "known reference bugs"):
- its argparse never defines ``--config`` yet main reads it (crash as-is);
  this CLI defines it properly;
- its test split was built from val image ids (train_seg_gan.py:402-403);
  here the test split uses the test directory like the supervised trainer.
"""

from __future__ import annotations

import argparse
import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import pandas as pd

from ssunet_gan_tpu.config import dump_model_card, load_experiment_config, load_model_card
from ssunet_gan_tpu.data.loader import BatchLoader
from ssunet_gan_tpu.models.gan import Discriminator, Generator
from ssunet_gan_tpu.ops.losses import get_loss
from ssunet_gan_tpu.parallel import make_mesh, replicate, shard_batch
from ssunet_gan_tpu.train import checkpoint as ckpt
from ssunet_gan_tpu.train.gan_step import make_gan_train_step
from ssunet_gan_tpu.train.optim import adam
from ssunet_gan_tpu.train.state import TrainState
from ssunet_gan_tpu.train.step import make_eval_step
from ssunet_gan_tpu.train.supervised import (
    _epoch_mean,
    build_datasets,
    evaluate,
    save_tensorboard,
)
from ssunet_gan_tpu.utils import count_params, jit_init, seed_everything


def parse_args():
    parser = argparse.ArgumentParser(description="adversarial segmentation fine-tuner")
    parser.add_argument("--config", required=True, help="config file")
    return parser.parse_args()


def warm_start(cfg, g_config, generator, g_variables):
    """Load the supervised checkpoint into the generator's ``net``
    (initialize_with_srresnet, models_seg_gan.py:216-233)."""
    gen_dir = os.path.join(cfg.file_path.model_path, g_config["name"])
    orbax_model = os.path.join(gen_dir, ckpt.MODEL_CKPT)
    torch_model = os.path.join(gen_dir, "model.pth")
    if os.path.isdir(orbax_model):
        template = jax.device_get(g_variables)
        sup_vars = ckpt.load_model(
            gen_dir, {k: template[k]["net"] for k in template if "net" in template[k]}
        )
        merged, report = ckpt.warm_start_generator(template, sup_vars)
        print(f"=> warm start from {orbax_model}: {len(report['loaded'])} tensors")
        return merged
    if os.path.exists(torch_model):
        merged, report = ckpt.warm_start_generator(
            jax.device_get(g_variables), torch_model, from_torch_pth=True
        )
        print(f"=> warm start from {torch_model} (torch): "
              f"{len(report['unmatched'])} unmatched")
        return merged
    print("=> no supervised checkpoint found; generator trains from scratch")
    return g_variables


def run_gan_experiment(cfg, synthetic=None, epochs_override=None, mesh=None,
                       use_tensorboard: bool = True):
    config = cfg.opt_config
    model_folder = cfg.file_path.model_path
    checkpoint_folder = cfg.file_path.checkpoint_path
    model_dir = os.path.join(model_folder, config["name"])
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(checkpoint_folder, exist_ok=True)
    dump_model_card(config, model_dir)

    writer = None
    if use_tensorboard:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=os.path.join(checkpoint_folder, config["name"]))
        except Exception:
            writer = None

    if "fused_spade" in config:
        from ssunet_gan_tpu.ops.spade_kernel import set_fused_spade

        set_fused_spade(bool(config["fused_spade"]))

    # generator from the supervised model card (train_seg_gan.py:445-448)
    generator_name = config["generator_name"]
    card_path = os.path.join(model_folder, generator_name, "config.yml")
    if os.path.exists(card_path):
        g_config = load_model_card(os.path.join(model_folder, generator_name))
    else:
        g_config = dict(config, name=generator_name)
    generator = Generator.from_config(g_config)
    discriminator = Discriminator(
        num_classes=config["num_classes"], kernel_size=3, n_channels=64,
        n_blocks=8, fc_size=1024,
    )

    mesh = mesh or make_mesh()
    root_key = seed_everything()
    k_g, k_d = jax.random.split(root_key)
    sample = jnp.zeros(
        (1, config["input_h"], config["input_w"], config["input_channels"]), jnp.float32
    )
    g_variables = jit_init(generator, k_g, sample, train=True)
    g_variables = warm_start(cfg, g_config, generator, g_variables)
    seg_sample = jnp.zeros(
        (1, config["input_h"], config["input_w"], config["num_classes"]), jnp.float32
    )
    d_variables = jit_init(discriminator, k_d, seg_sample, train=True)

    gan_lr = float(config["gan_lr"])
    tx_g, tx_d = adam(), adam()
    g_state = replicate(mesh, TrainState.create(g_variables, tx_g))
    d_state = replicate(mesh, TrainState.create(d_variables, tx_d))
    print(
        "=> GAN: generator %s (%d params), discriminator (%d params)"
        % (g_config["arch"], count_params(g_state.params), count_params(d_state.params))
    )

    seg_loss_fn = get_loss(config["loss"])
    # 'fused_train_dp' (opt-in card key): shard_map DP step so the fused
    # train kernels inside G run multi-chip (train/gan_step.py mesh= docs)
    fused_dp = bool(config.get("fused_train_dp", False))
    gan_step = make_gan_train_step(
        generator, discriminator, seg_loss_fn, tx_g, tx_d,
        config["num_classes"], mesh=mesh if fused_dp else None,
    )
    eval_step = make_eval_step(generator, seg_loss_fn, config["num_classes"])

    train_ds, val_ds, test_ds = build_datasets(cfg, synthetic)
    n_data = mesh.shape["data"]
    batch_size = max(config["batch_size"] // n_data * n_data, n_data)
    num_workers = int(config.get("num_workers", 3))
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True, drop_last=True,
                               num_workers=num_workers)
    val_loader = BatchLoader(val_ds, 1, num_workers=num_workers)
    test_loader = BatchLoader(test_ds, 1, num_workers=num_workers)

    log = OrderedDict(
        (k, [])
        for k in ("epoch", "lr", "loss", "iou", "dice", "val_loss", "val_iou", "val_dice")
    )
    best_iou = 0.0
    best_dice = 0.0
    iou_at_best_dice = 0.0
    trigger = 0
    epochs = epochs_override if epochs_override is not None else config["epochs"]

    # real resume (the reference GAN trainer has none): both G and D full
    # states (params, BN, spectral, optimizer moments) restore
    start_epoch = 0
    g_dir = os.path.join(model_dir, "generator_state")
    d_dir = os.path.join(model_dir, "discriminator_state")
    if config.get("resume") and ckpt.has_train_state(g_dir) and ckpt.has_train_state(d_dir):
        g_state, meta = ckpt.restore_train_state(g_dir, g_state)
        d_state, _ = ckpt.restore_train_state(d_dir, d_state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_iou = float(meta.get("best_iou", 0.0))
        print(f"=> resumed GAN from epoch {start_epoch} (best_iou {best_iou:.4f})")

    for epoch in range(start_epoch, epochs):
        print("Epoch [%d/%d]" % (epoch, epochs))
        print("generator learning rate {:d}: {:f}".format(epoch, gan_lr))
        meters = []
        img_dtype = jnp.bfloat16 if config.get("mixed_precision") else jnp.float32
        for _, img, mask, _ in train_loader:
            batch = shard_batch(
                mesh, (jnp.asarray(img, img_dtype), jnp.asarray(mask))
            )
            g_state, d_state, metrics = gan_step(
                g_state, d_state, batch, jnp.float32(gan_lr)
            )
            meters.append(metrics)
            if len(meters) >= 2:
                jax.block_until_ready(meters[-2])
        train_log = _epoch_mean(meters)

        val_log = evaluate(config, val_loader, mesh, g_state, eval_step)
        test_log = evaluate(config, test_loader, mesh, g_state, eval_step)

        if best_dice < test_log["dice"]:
            best_dice = test_log["dice"]
            iou_at_best_dice = test_log["iou"]
        print(
            "loss %.4f - iou %.4f - dice %.4f - val_loss %.4f - val_iou %.4f - "
            "val_dice %.4f - test_iou %.4f - test_dice %.4f - Best_dice %.4f - "
            "iou_AtBestDice %.4f"
            % (
                train_log["loss"], train_log["iou"], train_log["dice"],
                val_log["loss"], val_log["iou"], val_log["dice"],
                test_log["iou"], test_log["dice"], best_dice, iou_at_best_dice,
            )
        )
        save_tensorboard(writer, train_log, val_log, test_log, epoch)

        log["epoch"].append(epoch)
        log["lr"].append(config["lr"])
        log["loss"].append(train_log["loss"])
        log["iou"].append(train_log["iou"])
        log["dice"].append(train_log["dice"])
        log["val_loss"].append(val_log["loss"])
        log["val_iou"].append(val_log["iou"])
        log["val_dice"].append(val_log["dice"])
        pd.DataFrame(log).to_csv(os.path.join(model_dir, "log.csv"), index=False)
        trigger += 1

        # best generator by TEST IoU (train_seg_gan.py:528-530)
        if test_log["iou"] > best_iou:
            ckpt.save_model(model_dir, jax.device_get(g_state.variables()))
            best_iou = test_log["iou"]
            print("=> saved best model")
            trigger = 0
        ckpt.save_train_state(g_dir, jax.device_get(g_state), epoch,
                              {"best_iou": best_iou})
        ckpt.save_train_state(d_dir, jax.device_get(d_state), epoch)

        if config.get("early_stopping", -1) >= 0 and trigger >= config["early_stopping"]:
            print("=> early stopping")
            break

    if writer is not None:
        writer.close()
    return g_state, d_state, best_iou, pd.DataFrame(log)


def main():
    args = parse_args()
    cfg = load_experiment_config(args.config)
    run_gan_experiment(cfg)


if __name__ == "__main__":
    main()
