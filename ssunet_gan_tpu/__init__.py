"""ssunet_gan_tpu — TPU-native (JAX/XLA/Pallas) rebuild of the ssUnet-GAN stack.

A from-scratch framework for semantic segmentation of aerial/satellite imagery
with SPADE-conditioned U-Nets and SRGAN-style adversarial fine-tuning,
re-designed for TPU hardware:

- flax.linen modules in NHWC layout (XLA's preferred conv layout on TPU)
- batch statistics computed on global arrays under ``jit`` over a device mesh,
  so synchronized BatchNorm needs no communication backend at all
  (replaces the reference's vendored thread-based SyncBN,
  /root/reference/scripts/batchnorm.py + comm.py + replicate.py)
- jitted train steps (supervised + alternating GAN) with on-device metrics
- device-resident sliding-window whole-scene inference with scatter-add
  stitching (replaces the per-patch batch=1 host loop,
  /root/reference/scripts/aerial_image_segmentation_api.py:376-411)

Layer map mirrors SURVEY.md §1: cli → infer/train → models → ops → parallel → data.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SSUNET_GAN_TPU_PLATFORM"):
    # The axon TPU plugin ignores JAX_PLATFORMS; honoring our own env var via
    # jax.config (before backend init) lets CLIs/tests force cpu/tpu.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SSUNET_GAN_TPU_PLATFORM"])

from ssunet_gan_tpu.config import load_experiment_config, ExperimentConfig  # noqa: F401
