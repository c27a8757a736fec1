"""Tile SpaceNet-7 scenes (per-class grayscale labels) into training patches.

    python -m ssunet_gan_tpu.cli.preprocess_SN7 --input-root ../inputs

Mirrors /root/reference/scripts/preprocess_SN7.py (0.5-overlap 512 patches,
2 classes, 80/10/10 split seed 41).
"""

from __future__ import annotations

import argparse

from ssunet_gan_tpu.data.preprocess import preprocess_grayscale_label_scenes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-root", default="../inputs")
    p.add_argument("--image-name", default="SN7")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--num-class", type=int, default=2)
    p.add_argument("--stride-frac", type=float, default=0.5)
    args = p.parse_args()
    out = preprocess_grayscale_label_scenes(
        args.input_root, args.image_name, args.img_size, args.patch_size,
        args.num_class, args.stride_frac,
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
