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


def test_batchnorm_shard_map_matches_global(rng):
    """BatchNorm under the shard_map collectives context (local shard +
    psummed stats) matches the global-batch computation exactly."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ssunet_gan_tpu.ops import collectives
    from ssunet_gan_tpu.ops.norm import BatchNorm

    mesh = parallel.make_mesh()
    d = mesh.shape["data"]
    x = jnp.asarray(rng.normal(size=(2 * d, 4, 4, 6)).astype(np.float32))
    bn = BatchNorm(6)
    variables = bn.init(jax.random.PRNGKey(0), x, True)

    want, upd = bn.apply(variables, x, True, mutable=["batch_stats"])

    def body(v, xs):
        with collectives.train_axis("data", d):
            y, u = bn.apply(v, xs, True, mutable=["batch_stats"])
        return y, u

    got, upd_s = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P("data"), P()), check_vma=False,
        )
    )(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(upd_s["batch_stats"]["mean"]),
        np.asarray(upd["batch_stats"]["mean"]), rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(upd_s["batch_stats"]["var"]),
        np.asarray(upd["batch_stats"]["var"]), rtol=1e-6, atol=1e-7,
    )


@pytest.mark.slow
def test_train_step_shard_map_fused_dp_parity(rng):
    """The shard_map DP train step with the fused train kernels matches the
    (GSPMD-semantic) single-device XLA-composition step on the same global
    batch: loss, metrics and updated params. This is the multi-chip fused
    training path (make_train_step(mesh=...)); SyncBN comes from the psummed
    kernel stat sums (ops/collectives.py)."""
    import jax.numpy as jnp

    from ssunet_gan_tpu.models import build_model
    from ssunet_gan_tpu.ops.losses import bce_dice_loss
    from ssunet_gan_tpu.ops.stage_kernel_train import set_fused_train
    from ssunet_gan_tpu.train.optim import build_optimizer
    from ssunet_gan_tpu.train.state import TrainState
    from ssunet_gan_tpu.train.step import make_train_step
    from ssunet_gan_tpu.utils import jit_init

    mesh = parallel.make_mesh()
    d = mesh.shape["data"]
    model = build_model("UNet_R_SS_v2", num_classes=3, input_channels=3)
    x = jnp.asarray(rng.normal(size=(d, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray((rng.random((d, 32, 32, 3)) > 0.5).astype(np.float32))
    tx = build_optimizer({"optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-7})

    def run(fused, use_mesh):
        set_fused_train(fused)
        try:
            variables = jit_init(model, jax.random.PRNGKey(0), x, train=True)
            state = TrainState.create(variables, tx)
            if use_mesh:
                state = parallel.replicate(mesh, state)
                batch = parallel.shard_batch(mesh, (x, y))
                step = make_train_step(model, bce_dice_loss, tx, 3, clip=0.7,
                                       mesh=mesh)
            else:
                batch = (x, y)
                step = make_train_step(model, bce_dice_loss, tx, 3, clip=0.7)
            state, metrics = step(state, batch, jnp.float32(1e-3))
            return {k: float(v) for k, v in metrics.items()}, state
        finally:
            set_fused_train(None)

    m_ref, state_ref = run(False, False)
    m_dp, state_dp = run(True, True)
    assert abs(m_dp["loss"] - m_ref["loss"]) < 2e-3, (m_dp, m_ref)
    assert abs(m_dp["iou"] - m_ref["iou"]) < 1e-5, (m_dp, m_ref)
    assert abs(m_dp["dice"] - m_ref["dice"]) < 1e-4, (m_dp, m_ref)
    la = jax.tree_util.tree_leaves(state_ref.params)
    lb = jax.tree_util.tree_leaves(state_dp.params)
    worst = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(la, lb)
    )
    assert worst < 5e-3, worst


def test_gan_step_shard_map_dp_parity(rng):
    """The shard_map DP GAN step (make_gan_train_step(mesh=...)) matches the
    plain step on the same global batch: losses, metrics and both updated
    param trees (SyncBN in D via the collectives context; grad value-clips
    apply outside on the pmean'd grads, matching GSPMD order)."""
    import jax.numpy as jnp

    from tests.test_gan import _states
    from ssunet_gan_tpu.ops.losses import bce_dice_loss
    from ssunet_gan_tpu.train.gan_step import make_gan_train_step

    mesh = parallel.make_mesh()
    d = mesh.shape["data"]
    img = jnp.asarray(rng.normal(size=(d, 16, 16, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((d, 16, 16, 2)) > 0.5).astype(np.float32))

    def run(use_mesh):
        gen, disc, g_state, d_state, tx_g, tx_d = _states(rng)
        step = make_gan_train_step(
            gen, disc, bce_dice_loss, tx_g, tx_d, num_classes=2,
            mesh=mesh if use_mesh else None,
        )
        if use_mesh:
            g_state = parallel.replicate(mesh, g_state)
            d_state = parallel.replicate(mesh, d_state)
            batch = parallel.shard_batch(mesh, (img, mask))
        else:
            batch = (img, mask)
        g_state, d_state, metrics = step(g_state, d_state, batch,
                                         jnp.float32(2e-5))
        return ({k: float(v) for k, v in metrics.items()},
                jax.device_get(g_state.params), jax.device_get(d_state.params))

    m_ref, gp_ref, dp_ref = run(False)
    m_dp, gp_dp, dp_dp = run(True)
    for k in ("loss", "perceptual_loss", "adv_loss", "d_loss", "iou", "dice"):
        assert abs(m_dp[k] - m_ref[k]) < 2e-4, (k, m_dp[k], m_ref[k])
    for name, (a_tree, b_tree) in {
        "G": (gp_ref, gp_dp), "D": (dp_ref, dp_dp),
    }.items():
        la = jax.tree_util.tree_leaves(a_tree)
        lb = jax.tree_util.tree_leaves(b_tree)
        worst = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(la, lb)
        )
        assert worst < 1e-4, (name, worst)
