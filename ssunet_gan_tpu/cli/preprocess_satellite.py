"""Tile aerial RGB-label scenes into training patches.

    python -m ssunet_gan_tpu.cli.preprocess_satellite \
        --input-root ../inputs --image-name chicago --img-size 512

Mirrors /root/reference/scripts/preprocess_satellite.py (non-overlapping
512 patches, 3 color-coded classes, 80/10/10 split seed 41); the hardcoded
paths/names become arguments.
"""

from __future__ import annotations

import argparse

from ssunet_gan_tpu.data.preprocess import preprocess_color_label_scenes


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input-root", default="../inputs")
    p.add_argument("--image-name", default="chicago")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--patch-size", type=int, default=512)
    p.add_argument("--num-class", type=int, default=3)
    p.add_argument("--stride-frac", type=float, default=1.0,
                   help="stride as a fraction of patch size (1.0 = no overlap)")
    args = p.parse_args()
    out = preprocess_color_label_scenes(
        args.input_root, args.image_name, args.img_size, args.patch_size,
        args.num_class, args.stride_frac,
    )
    print("wrote", out)


if __name__ == "__main__":
    main()
