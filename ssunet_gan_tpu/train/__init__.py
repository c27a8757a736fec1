"""Training loops / experiment management (SURVEY.md §1 L5).

- :mod:`ssunet_gan_tpu.train.optim`      — torch-semantics optimizers/schedulers
- :mod:`ssunet_gan_tpu.train.state`      — functional train state pytrees
- :mod:`ssunet_gan_tpu.train.step`       — jitted supervised train/eval steps
- :mod:`ssunet_gan_tpu.train.gan_step`   — jitted alternating G/D steps
- :mod:`ssunet_gan_tpu.train.checkpoint` — orbax checkpoints + model cards
- :mod:`ssunet_gan_tpu.train.supervised` — ``train.py`` CLI equivalent
- :mod:`ssunet_gan_tpu.train.gan`        — ``train_seg_gan.py`` CLI equivalent
"""

from ssunet_gan_tpu.train.state import TrainState  # noqa: F401
