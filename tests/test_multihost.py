"""Multi-host (multi-process) distribution tests.

The 2-process path spawns real subprocesses (each with 4 virtual CPU
devices) that form a ('dcn', 'data', 'model') mesh via
jax.distributed.initialize and run one jitted train step with per-host
data loading — the loss must match the same step computed single-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_loss() -> float:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import multihost_worker as w

    import jax
    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    config = w.tiny_config(1)
    tx = make_optimizer(config, steps_per_epoch=10)
    state = create_train_state(config, tx, jax.random.key(0))
    step = make_train_step(config, tx, donate=False)
    _, metrics = step(state, w.global_batch(config))
    return float(metrics["loss"])


@pytest.mark.slow
def test_two_process_train_step_matches_single():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
    loss_lines = [line for rc, out, _ in outs
                  for line in out.splitlines() if line.startswith("LOSS ")]
    # every process reports; the replicas must agree exactly-ish
    assert len(loss_lines) == 2, outs
    losses = sorted(float(line.split()[1]) for line in loss_lines)
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    multi_loss = losses[0]

    single_loss = _single_process_loss()
    # bf16 conv stack + per-process partial-batch reductions reorder the
    # f32 accumulations; observed cross-process drift is ~3e-4 relative
    # (a wrong collective or a dropped shard would be orders larger)
    np.testing.assert_allclose(multi_loss, single_loss, rtol=1e-3)


def test_multihost_mesh_single_process():
    """The ('dcn','data','model') mesh builder degrades to a single-process
    mesh (dcn=1) with the same device set as the 2D helper."""
    import jax

    from voxelnet_tpu.parallel import distributed, make_mesh

    mesh = distributed.make_multihost_mesh(num_dcn=1, num_data=4,
                                           num_model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (1, 4, 2)
    flat_2d = make_mesh(num_data=4, num_model=2).devices.ravel().tolist()
    assert mesh.devices.ravel().tolist() == flat_2d


def test_stage_global_batch_single_process(tiny_config, tiny_batch):
    """Single-process staging must equal plain device_put sharding."""
    from jax.sharding import PartitionSpec as P

    from voxelnet_tpu.parallel import distributed

    mesh = distributed.make_multihost_mesh(num_dcn=1, num_data=2,
                                           num_model=1)
    staged = distributed.stage_global_batch(mesh, dict(tiny_batch))
    assert staged["points"].shape == tiny_batch["points"].shape
    np.testing.assert_array_equal(
        np.asarray(staged["points"]), tiny_batch["points"])
    spec = staged["points"].sharding.spec
    assert spec == P(("dcn", "data"))


@pytest.mark.slow
def test_two_process_full_trainer(tmp_path):
    """End-to-end multi-host Trainer: 1 epoch over an on-disk mini-KITTI
    across 2 processes — per-host loading, collective steps, Orbax save,
    per-host label dumps that jointly cover every val frame."""
    data = tmp_path / "kitti"
    label = ("Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
             "-0.65 1.71 6.70 -1.59\n")
    rng = np.random.default_rng(0)
    for split, n in (("training", 8), ("validation", 4)):
        for sub in ("velodyne", "label_2", "image_2"):
            os.makedirs(data / split / sub)
        for i in range(n):
            pts = np.concatenate([
                rng.uniform([0, -6.4, -3], [12.8, 6.4, 1], (1500, 3)),
                rng.uniform(0, 1, (1500, 1))], axis=1).astype(np.float32)
            pts.tofile(data / split / "velodyne" / f"{i:06d}.bin")
            (data / split / "label_2" / f"{i:06d}.txt").write_text(label)
            (data / split / "image_2" / f"{i:06d}.png").write_bytes(b"")

    exp = tmp_path / "exp"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    env["VOXELNET_PLATFORM"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "trainer", str(pid), "2", str(port),
             str(data), str(exp)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"trainer worker failed:\n{out}\n{err}"
    assert any("TRAINER_OK" in out for out, _ in outs)
    # per-host dumps jointly cover every validation frame
    pred_dir = exp / "preds" / "1" / "data"
    assert sorted(os.listdir(pred_dir)) == [
        f"{i:06d}.txt" for i in range(4)]
    # checkpoint written collectively
    assert (exp / "checkpoints" / "0").is_dir()


def test_local_rows_dedups_replicated_model_axis():
    """Arrays replicated over 'model' expose one addressable shard per
    device; local_rows must return each batch row exactly once, and fall
    back to a global fetch when trailing axes are sharded."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxelnet_tpu.parallel import distributed

    mesh = distributed.make_multihost_mesh(num_dcn=1, num_data=4,
                                           num_model=2)
    x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
    xs = jax.device_put(x, NamedSharding(mesh, P(("dcn", "data"))))
    np.testing.assert_array_equal(distributed.local_rows(xs),
                                  np.asarray(x))
    # batch AND trailing axis sharded (e.g. W-sharded maps)
    y = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    ys = jax.device_put(
        y, NamedSharding(mesh, P(("dcn", "data"), "model")))
    np.testing.assert_array_equal(distributed.local_rows(ys),
                                  np.asarray(y))
