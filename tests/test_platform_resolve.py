"""Regression tests for the round-3 multichip escape (VERDICT r03 #1):
backend/interpret resolution must key off the devices that will EXECUTE
(mesh / ambient mesh / explicit platform), never the process-global
`jax.default_backend()` alone.

The failure environment: a TPU plugin is registered (default backend
"tpu") but the mesh in play is built from CPU fallback devices — exactly
what the driver's `dryrun_multichip` does, and what a CPU side-job next
to the exclusive chip does. Round 3 resolved 'auto' -> 'planar' from the
global and compiled a non-interpret Pallas call for CPU devices.
"""

import dataclasses

import jax
import numpy as np
import pytest

from voxelnet_tpu.parallel import execution_platform, make_mesh, shard_batch


@pytest.fixture
def fake_tpu_default(monkeypatch):
    """Simulate the driver env: default backend claims 'tpu' while every
    real device in the test process is CPU."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_execution_platform_priority(fake_tpu_default):
    mesh = make_mesh(num_data=2, num_model=1)
    assert execution_platform() == "tpu"                # global fallback
    assert execution_platform(platform="cpu") == "cpu"  # explicit wins
    assert execution_platform(mesh=mesh) == "cpu"       # mesh devices win
    assert execution_platform(mesh=mesh, platform="tpu") == "tpu"
    with jax.set_mesh(mesh):
        assert execution_platform() == "cpu"            # ambient mesh wins


def test_resolves_follow_mesh_not_default_backend(tiny_config,
                                                  fake_tpu_default):
    from voxelnet_tpu.models import voxelnet as vx

    cfg = tiny_config
    # without a mesh the (fake) TPU default backend decides: the TPU
    # production picks
    assert vx.resolve_middle_backend(cfg) == "wpack2"
    assert vx.resolve_train_vfe_backend(cfg) == "planar"
    assert vx.resolve_vfe_backend(cfg) == "fused"
    assert vx.resolve_bev_fold(cfg) == "dsplit"
    # explicit platform overrides the global
    assert vx.resolve_middle_backend(cfg, "cpu") == "conv3d"
    assert vx.resolve_train_vfe_backend(cfg, "cpu") == "xla"
    assert vx.resolve_vfe_backend(cfg, "cpu") == "xla"
    assert vx.resolve_bev_fold(cfg, "cpu") == "transpose"
    # under a CPU mesh every 'auto' must route to a backend runnable on
    # those devices — THE r03 escape vector
    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        assert vx.resolve_middle_backend(cfg) == "conv3d"
        assert vx.resolve_train_vfe_backend(cfg) == "xla"
        assert vx.resolve_vfe_backend(cfg) == "xla"
        assert vx.resolve_bev_fold(cfg) == "transpose"


def test_train_step_runs_on_cpu_mesh_with_tpu_default(
        tiny_config, tiny_batch, fake_tpu_default):
    """The exact r03 failure shape: 'auto' config, CPU mesh, TPU global
    default. Must compile + run (r03 died in a non-interpret pallas_call
    at train_step trace time)."""
    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        tx = make_optimizer(tiny_config, steps_per_epoch=10)
        state = create_train_state(tiny_config, tx, jax.random.key(0))
        step = make_train_step(tiny_config, tx, donate=False)
        _, m = step(state, shard_batch(mesh, tiny_batch))
        assert np.isfinite(float(m["loss"]))


def test_planar_explicit_interprets_on_cpu_mesh(
        tiny_config, tiny_batch, fake_tpu_default):
    """An EXPLICIT 'planar' request on a CPU mesh must auto-select the
    Pallas interpreter from the mesh's devices, not the global."""
    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, train_vfe_backend="planar"))
    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = create_train_state(cfg, tx, jax.random.key(0))
        step = make_train_step(cfg, tx, donate=False, mesh=mesh)
        _, m = step(state, shard_batch(mesh, tiny_batch))
        assert np.isfinite(float(m["loss"]))


def test_fused_inference_interprets_on_cpu_mesh(
        tiny_config, tiny_batch, fake_tpu_default):
    """Explicit fused VFE under a CPU mesh: the shard_mapped pallas_call
    must run interpreted (mesh devices), despite the TPU global."""
    from voxelnet_tpu.models.voxelnet import init_params, make_inference_fn

    cfg_sh = tiny_config.replace(
        system=tiny_config.system.__class__(
            **{**tiny_config.system.__dict__, "num_data_shards": 2}),
        data=dataclasses.replace(tiny_config.data, vfe_backend="fused",
                                 middle_backend="conv3d"),
    )
    mesh = make_mesh(num_data=2, num_model=1)
    with jax.set_mesh(mesh):
        variables = init_params(cfg_sh, jax.random.key(0))
        fn = make_inference_fn(cfg_sh, mesh=mesh)
        batch = shard_batch(mesh, {"points": tiny_batch["points"],
                                   "num_points": tiny_batch["num_points"]})
        det = jax.jit(fn)(variables, batch["points"], batch["num_points"])
        assert np.isfinite(np.asarray(det.scores)).all()
