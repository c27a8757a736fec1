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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-out: SSUNET_GAN_TPU_XLA_CACHE=0).

    Every entry point pays 20-40 s (TPU) / minutes (1-core CPU mesh) of cold
    compiles per program otherwise; bench.py, the driver dryrun, tools, and
    repeat test sessions all hit the same programs. Cache location override:
    SSUNET_GAN_TPU_XLA_CACHE=<dir>.
    """
    cache = _os.environ.get("SSUNET_GAN_TPU_XLA_CACHE")
    if cache == "0":
        return
    if not cache:
        cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "ssunet_gan_tpu", "xla"
        )
    try:
        _os.makedirs(cache, exist_ok=True)
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", cache)
        # cache even fast-compiling programs: re-runs over the 1-core host /
        # axon tunnel are the target, where every compile is expensive
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from ssunet_gan_tpu.config import load_experiment_config, ExperimentConfig  # noqa: F401
