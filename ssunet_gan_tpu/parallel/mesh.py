"""Mesh + sharding helpers (the whole "distributed backend").

The reference's data parallelism is single-process multi-GPU
``torch.nn.DataParallel`` (train.py:288) with vendored synchronized
BatchNorm (batchnorm.py:50-127).  Here a ``data`` mesh axis plus
`NamedSharding` annotations give the same semantics: XLA splits the batch
across devices and inserts ICI collectives for every cross-batch reduction
(BN statistics, loss/metric means, and the implicit gradient all-reduce).

A ``model`` axis is also supported for wider-than-one-chip configurations
(sharding conv channels); the model zoo here is small enough that pure DP
is the production configuration, matching the reference's capability.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``n_data=None`` uses every device on the data axis (the standard DP
    configuration).  ``n_model>1`` carves a model axis for channel sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {use} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: split dim 0 over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (model/optimizer state under pure DP)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put every array in ``batch`` with dim-0 sharded over 'data'.

    Batch dim must divide the data-axis size (the loader pads/drops to
    guarantee this, mirroring the reference's ``drop_last=True``,
    train.py:390).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in ``tree`` fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Multi-host setup: `jax.distributed.initialize` + a global data mesh.

    The reference is strictly single-host (SURVEY.md §2 parallelism table);
    this is the optional multi-node extension: each host contributes its
    local chips to one global ``data`` axis, and the same jitted train step
    runs unchanged (batches must arrive globally sharded — use
    :func:`shard_batch` with each host's local shard).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return make_mesh()
