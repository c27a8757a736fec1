"""Mesh / multi-host wiring tests.

``initialize_multihost`` can't be run for real in a single-process test
session, so the distributed bootstrap is mocked and the wiring asserted:
the coordinator arguments must reach ``jax.distributed.initialize`` verbatim
and the returned mesh must be the standard global data mesh.
"""

import jax
import numpy as np
import pytest

from ssunet_gan_tpu import parallel


def test_make_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["model"] == 1

    mesh2 = parallel.make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}

    with pytest.raises(ValueError):
        parallel.make_mesh(n_data=len(jax.devices()), n_model=2)


def test_initialize_multihost_wiring(monkeypatch):
    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    mesh = parallel.initialize_multihost(
        coordinator_address="10.0.0.1:1234", num_processes=2, process_id=0
    )
    assert calls == {
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 2,
        "process_id": 0,
    }
    # same global data mesh the single-host path uses: every (local) device
    # lands on the 'data' axis, model axis 1
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == len(jax.devices())
    assert mesh.shape["model"] == 1


def test_shard_batch_and_replicate_roundtrip(rng):
    mesh = parallel.make_mesh()
    n = mesh.shape["data"]
    batch = rng.normal(size=(2 * n, 4, 4, 3)).astype(np.float32)
    sharded = parallel.shard_batch(mesh, batch)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec("data")
    np.testing.assert_array_equal(np.asarray(sharded), batch)

    tree = {"w": rng.normal(size=(3, 3)).astype(np.float32)}
    rep = parallel.replicate(mesh, tree)
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])
