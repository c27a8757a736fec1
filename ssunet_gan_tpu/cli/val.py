"""Test-split evaluation with per-image CSV + overlay visualization.

    python -m ssunet_gan_tpu.cli.val --config <file> [--ss_unet_gan true|false]

Mirrors /root/reference/scripts/val.py:117-274:
- loads the ``val_config.name`` model — GAN-generator path by default
  (the reference hardcodes ``ss_unet_GAN=True``, val.py:131; here it is a
  flag) — with strict=False loading of orbax or torch checkpoints;
- iterates the test split batch=1, scores channels 1.. IoU/Dice;
- writes per-class GT/RE/GT+RE overlay JPGs (val.py:104-114, 248-260)
  and a (filename, iou, dice) CSV sorted by filename (val.py:33-36, 270);
- prints the means.

Unlike the reference (hardcoded ``../configs/config_SN7.json``, val.py:119),
the config path is a real argument.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from ssunet_gan_tpu.config import load_experiment_config, load_model_card
from ssunet_gan_tpu.data.dataset import SegmentationDataset, list_split_ids
from ssunet_gan_tpu.data.loader import BatchLoader
from ssunet_gan_tpu.data.transforms import val_transform
from ssunet_gan_tpu.infer.overlays import save_gt_re_mask
from ssunet_gan_tpu.models import build_model
from ssunet_gan_tpu.models.gan import Generator
from ssunet_gan_tpu.ops.metrics import dice_coef, foreground_slice, iou_score
from ssunet_gan_tpu.train import checkpoint as ckpt
from ssunet_gan_tpu.utils import AverageMeter, jit_init, str2bool


def parse_args():
    parser = argparse.ArgumentParser(description="test-split evaluation")
    parser.add_argument("--config", required=True, help="config file")
    parser.add_argument("--ss_unet_gan", type=str2bool, default=True,
                        help="load the model as a GAN generator (val.py:131)")
    return parser.parse_args()


def result_save_to_csv_filename(csv_save_name, result_submission):
    """(filename, iou, dice) CSV sorted by filename (val.py:33-36)."""
    df = pd.DataFrame(result_submission, columns=["filename", "iou", "dice"])
    df.sort_values("filename").to_csv(csv_save_name, index=False)


def load_eval_model(model_folder: str, name: str, ss_unet_gan: bool):
    """Build + load the eval model (val.py:131-180); returns
    (model, variables, config)."""
    config = load_model_card(os.path.join(model_folder, name))
    if ss_unet_gan:
        model = Generator.from_config(config)
    else:
        model = build_model(
            config["arch"], config["num_classes"], config["input_channels"],
            bool(config["deep_supervision"]),
        )
    config["name"] = name
    sample = jnp.zeros(
        (1, config["input_h"], config["input_w"], config["input_channels"]), jnp.float32
    )
    template = jax.device_get(jit_init(model, jax.random.PRNGKey(0), sample, train=False))
    model_dir = os.path.join(model_folder, name)
    if os.path.isdir(os.path.join(model_dir, ckpt.MODEL_CKPT)):
        variables = ckpt.load_model(model_dir, template)
    elif os.path.exists(os.path.join(model_dir, "model.pth")):
        from ssunet_gan_tpu.compat import load_torch_checkpoint

        variables, _ = load_torch_checkpoint(
            os.path.join(model_dir, "model.pth"), template
        )
    else:
        raise FileNotFoundError(f"no checkpoint in {model_dir}")
    return model, variables, config


def main():
    args = parse_args()
    cfg = load_experiment_config(args.config)
    name = cfg.val_config["name"]
    input_folder = cfg.file_path.input_path
    model_folder = cfg.file_path.model_path
    output_folder = cfg.file_path.output_path

    model, variables, config = load_eval_model(model_folder, name, args.ss_unet_gan)
    num_classes = config["num_classes"]

    @jax.jit
    def forward(image):
        out = model.apply(variables, image, False)
        if isinstance(out, (list, tuple)):
            out = out[-1]  # deep supervision: last head (val.py:231-236)
        return out

    ids = list_split_ids(input_folder, config["val_dataset"], "test", config["img_ext"])
    dataset = SegmentationDataset(
        img_ids=ids,
        img_dir=os.path.join(input_folder, config["val_dataset"], "images", "test"),
        mask_dir=os.path.join(input_folder, config["val_dataset"], "annotations", "test"),
        img_ext=config["img_ext"],
        mask_ext=config["mask_ext"],
        num_classes=num_classes,
        input_channels=config["input_channels"],
        transform=val_transform(config),
    )
    loader = BatchLoader(dataset, 1, num_workers=int(config.get("num_workers", 3)))

    for c in range(num_classes):
        os.makedirs(os.path.join(output_folder, config["name"], str(c)), exist_ok=True)
    csv_save_name = os.path.join(output_folder, config["name"] + "_result.csv")

    avg = {"iou": AverageMeter(), "dice": AverageMeter()}
    result_submission = []
    for ori_img, img, target, meta in loader:
        output = forward(jnp.asarray(img))
        out_m = foreground_slice(output, num_classes)
        tar_m = foreground_slice(jnp.asarray(target), num_classes)
        iou = float(iou_score(out_m, tar_m))
        dice = float(dice_coef(out_m, tar_m))
        result_submission.append([meta["img_id"][0], iou, dice])
        avg["iou"].update(iou, img.shape[0])
        avg["dice"].update(dice, img.shape[0])

        probs = np.asarray(jax.device_get(jax.nn.sigmoid(output)))
        for i in range(len(probs)):
            for idx_c in range(num_classes):
                mask = (255 * target[i][..., idx_c]).astype(np.uint8)
                mask_out = (255 * probs[i][..., idx_c]).astype(np.uint8)
                mask_output = np.where(mask_out > 127, 255, 0).astype(np.uint8)
                if idx_c > 0:
                    save_gt_re_mask(output_folder, config, meta, idx_c, i,
                                    ori_img, mask, mask_output)

    result_save_to_csv_filename(csv_save_name, result_submission)
    print("IoU: %.4f" % avg["iou"].avg)
    print("dice: %.4f" % avg["dice"].avg)


if __name__ == "__main__":
    main()
