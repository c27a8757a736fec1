"""Data plane (SURVEY.md §1 L1): datasets, transforms, loaders, tiling.

- :mod:`ssunet_gan_tpu.data.transforms`  — albumentations-equivalent joint
  image+mask augmentation pipeline (train.py:339-354) in numpy/cv2
- :mod:`ssunet_gan_tpu.data.dataset`     — patch-training dataset with the
  per-class mask directory convention (dataset.py:47-144)
- :mod:`ssunet_gan_tpu.data.loader`      — prefetching batch loader feeding
  the device (replaces torch DataLoader worker processes)
- :mod:`ssunet_gan_tpu.data.tiling`      — 4-pass sliding-window patch grid +
  coverage-weighted merge (dataset.py:147-220, api:119-217)
"""

from ssunet_gan_tpu.data.dataset import SegmentationDataset  # noqa: F401
from ssunet_gan_tpu.data.loader import BatchLoader  # noqa: F401
