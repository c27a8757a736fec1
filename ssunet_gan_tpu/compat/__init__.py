from ssunet_gan_tpu.compat.torch_loader import (  # noqa: F401
    convert_torch_state_dict,
    discriminator_fc1_transform,
    load_torch_checkpoint,
    remove_prefix,
)
