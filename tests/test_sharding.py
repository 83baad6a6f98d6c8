"""Multi-device mesh tests on the 8 virtual CPU devices (SURVEY.md §4d)."""

import jax
import numpy as np
import pytest

from voxelnet_tpu.parallel import batch_sharding, make_mesh, shard_batch


def test_make_mesh_shapes():
    mesh = make_mesh(num_data=4, num_model=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    # smaller meshes take a device subset
    assert make_mesh(num_data=3, num_model=2).devices.shape == (3, 2)
    with pytest.raises(ValueError):
        make_mesh(num_data=16, num_model=2)


def test_shard_batch_places_on_mesh(tiny_batch):
    mesh = make_mesh(num_data=8, num_model=1)
    big = {"points": np.tile(tiny_batch["points"], (4, 1, 1))}
    sharded = shard_batch(mesh, big)
    assert sharded["points"].sharding == batch_sharding(mesh)


def test_data_parallel_train_step_matches_single_device(tiny_config,
                                                        tiny_batch):
    """DP over the mesh computes the same loss as one device."""
    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    cfg = tiny_config
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, tx, jax.random.key(0))
    step = make_train_step(cfg, tx, donate=False)

    _, m_single = step(state, tiny_batch)

    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        state2 = create_train_state(cfg, tx, jax.random.key(0))
        step2 = make_train_step(cfg, tx, donate=False)
        batch = shard_batch(mesh, tiny_batch)
        _, m_mesh = step2(state2, batch)

    assert float(m_mesh["loss"]) == pytest.approx(
        float(m_single["loss"]), rel=2e-2)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
