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


def test_dryrun_multichip_driver_shaped():
    """Run dryrun_multichip(8) in a subprocess that does NOT inherit this
    suite's forced-CPU platform (conftest.py) — the only in-repo executable
    that resembles the driver environment, where the axon TPU plugin is
    registered and possibly version-skewed. The dryrun must pin itself to
    the CPU platform before any JAX client init and never touch the TPU
    client (VERDICT r04 #1: MULTICHIP_r03/r04 both failed exactly here
    while this suite stayed green under the conftest platform).
    """
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = repo
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "dryrun_multichip(8)" in r.stdout


def test_spatial_sharding_matches_unsharded(tiny_config, tiny_batch):
    """W-axis spatial sharding of the BEV grid (XLA halo exchange) must be
    numerically equivalent to the unsharded forward."""
    import jax.numpy as jnp

    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)

    plain = build_model(cfg)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, vox.features, vox.coords, vox.counts)

    cfg_sharded = cfg.replace(system=cfg.system.__class__(
        **{**cfg.system.__dict__, "num_data_shards": 2,
           "num_model_shards": 2}))
    sharded = build_model(cfg_sharded)
    mesh = make_mesh(num_data=2, num_model=2)
    with jax.set_mesh(mesh):
        out_sharded = jax.jit(
            lambda v, f, c, n: sharded.apply(v, f, c, n, train=False)
        )(variables, vox.features, vox.coords, vox.counts)

    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_sharded[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_plain[1]),
                               np.asarray(out_sharded[1]), atol=2e-2)


def test_wpack_spatial_sharding_matches_unsharded(tiny_config, tiny_batch):
    """The W-paired middle lowering under W-axis 'model' sharding: the
    paired conv's W-stride-2 must partition correctly (XLA halo
    exchange) and agree with the unsharded wpack forward."""
    import dataclasses

    import jax.numpy as jnp

    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="wpack"))
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)

    plain = build_model(cfg)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, vox.features, vox.coords, vox.counts)

    cfg_sharded = cfg.replace(system=cfg.system.__class__(
        **{**cfg.system.__dict__, "num_data_shards": 2,
           "num_model_shards": 2}))
    sharded = build_model(cfg_sharded)
    mesh = make_mesh(num_data=2, num_model=2)
    with jax.set_mesh(mesh):
        out_sharded = jax.jit(
            lambda v, f, c, n: sharded.apply(v, f, c, n, train=False)
        )(variables, vox.features, vox.coords, vox.counts)

    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_sharded[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_plain[1]),
                               np.asarray(out_sharded[1]), atol=2e-2)


def test_wpack2_spatial_sharding_matches_unsharded(tiny_config,
                                                    tiny_batch):
    """The paired-throughout middle lowering under W-axis 'model'
    sharding: GSPMD must partition the paired (.., W/2, 2C) activations
    (halo exchange over the pair axis) and agree with unsharded."""
    import dataclasses

    import jax.numpy as jnp

    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="wpack2"))
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)

    plain = build_model(cfg)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, vox.features, vox.coords, vox.counts)

    cfg_sharded = cfg.replace(system=cfg.system.__class__(
        **{**cfg.system.__dict__, "num_data_shards": 2,
           "num_model_shards": 2}))
    sharded = build_model(cfg_sharded)
    mesh = make_mesh(num_data=2, num_model=2)
    with jax.set_mesh(mesh):
        out_sharded = jax.jit(
            lambda v, f, c, n: sharded.apply(v, f, c, n, train=False)
        )(variables, vox.features, vox.coords, vox.counts)

    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_sharded[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_plain[1]),
                               np.asarray(out_sharded[1]), atol=2e-2)


def test_sparse1_data_parallel_train_step(tiny_config, tiny_batch):
    """sparse1 rejects spatial 'model' sharding by design, but plain
    batch data-parallelism must work: the vmapped per-frame scatter-adds
    partition cleanly over the 'data' axis."""
    import dataclasses

    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="sparse1"))
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, tx, jax.random.key(0))
    step = make_train_step(cfg, tx, donate=False)
    _, m_single = step(state, tiny_batch)

    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        state2 = create_train_state(cfg, tx, jax.random.key(0))
        step2 = make_train_step(cfg, tx, donate=False)
        _, m_mesh = step2(state2, shard_batch(mesh, tiny_batch))

    assert float(m_mesh["loss"]) == pytest.approx(
        float(m_single["loss"]), rel=2e-2)
