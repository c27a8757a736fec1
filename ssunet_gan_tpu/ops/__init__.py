from ssunet_gan_tpu.ops import losses, metrics  # noqa: F401
