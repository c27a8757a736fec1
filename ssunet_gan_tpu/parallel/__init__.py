"""Parallelism runtime — mesh construction and sharding helpers.

Replaces the reference's entire multi-device story (`torch.nn.DataParallel`
at train.py:288 plus ~600 lines of vendored thread-based SyncBN in
batchnorm.py/comm.py/replicate.py) with the TPU-native design:

- one `jax.sharding.Mesh` with a ``data`` axis (ICI within a slice);
- batches sharded on ``data``, model state replicated;
- the train step is jitted over *global* arrays, so batch-stat and gradient
  reductions are ordinary `jnp.mean`s that XLA lowers to ICI collectives —
  synchronized BatchNorm and gradient all-reduce fall out for free.

No NCCL/MPI/Gloo backend exists or is needed (SURVEY.md §2).
"""

from ssunet_gan_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated_sharding,
    shard_batch,
    replicate,
)
