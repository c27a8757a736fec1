"""``python -m ssunet_gan_tpu.cli.train_seg_gan --config <file>`` — GAN
fine-tuner (reference scripts/train_seg_gan.py)."""

from ssunet_gan_tpu.train.gan import main

if __name__ == "__main__":
    main()
