"""``python -m ssunet_gan_tpu.cli.train --config <file>`` — supervised trainer
(reference scripts/train.py)."""

from ssunet_gan_tpu.train.supervised import main

if __name__ == "__main__":
    main()
