"""Multi-host smoke worker: one process of an N-process CPU train step.

Run by tests/test_multihost.py (and __graft_entry__.dryrun_multihost) as

    python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form a
('dcn', 'data', 'model') = (N, 4, 1) mesh (DCN major). Every process loads
only ITS batch rows (per-host data loading via
jax.make_array_from_process_local_data), runs ONE jitted train step over
the global mesh, and process 0 prints `LOSS <value>` — the test compares
it against the same step computed single-process.

The reference has no distributed path at all (SURVEY.md §5); this is the
TPU-native equivalent of a multi-node data-parallel smoke test.
"""

from __future__ import annotations

import os
import sys

DEV_PER_PROC = 4
GLOBAL_BATCH = 8  # frames; must divide by num_processes


def tiny_config(num_processes: int):
    from voxelnet_tpu.config import get_config

    return get_config(
        "Car",
        system={"num_dcn_shards": num_processes,
                "num_data_shards": DEV_PER_PROC,
                "num_model_shards": 1},
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 2048, "max_voxels": 256, "max_gt_boxes": 8},
        # f32 compute: the single- vs multi-process comparison must not be
        # blurred by bf16 reduction-order noise
        train={"batch_size": GLOBAL_BATCH, "compute_dtype": "float32"},
    )


def global_batch(config):
    """Deterministic synthetic global batch (same on every process)."""
    import numpy as np

    B = GLOBAL_BATCH
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform([0.0, -6.4, -3.0], [12.8, 6.4, 1.0], (B, 1500, 3)),
        rng.uniform(0.0, 1.0, (B, 1500, 1)),
    ], axis=-1).astype(np.float32)
    points = np.zeros((B, config.data.max_points, 4), np.float32)
    points[:, :1500] = pts
    gt = np.zeros((B, 8, 7), np.float32)
    gt[:, 0] = [6.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
    gt_mask = np.zeros((B, 8), bool)
    gt_mask[:, 0] = True
    return {
        "points": points,
        "num_points": np.full((B,), 1500, np.int32),
        "gt_boxes": gt,
        "gt_mask": gt_mask,
    }


def main_trainer(pid: int, nproc: int, port: str, data_dir: str,
                 exp_dir: str):
    """Full multi-host Trainer drive: 1 epoch over an on-disk mini-KITTI,
    exercising per-host loading, global batch staging, collective
    train/eval steps, Orbax checkpointing and per-host label dumps."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.parallel import distributed
    from voxelnet_tpu.training.trainer import Trainer

    distributed.initialize(f"localhost:{port}", nproc, pid)
    config = get_config(
        "Car",
        # mesh must span ALL devices: nproc DCN slices x 4 local devices
        system={"num_dcn_shards": nproc, "num_data_shards": DEV_PER_PROC,
                "num_model_shards": 1},
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 2048, "max_voxels": 256, "max_gt_boxes": 8},
        train={"batch_size": 4 * nproc, "num_epochs": 1,
               "compute_dtype": "float32"},
        val={"batch_size": 4 * nproc},
    )
    with Trainer(config, os.path.join(data_dir, "training"),
                 os.path.join(data_dir, "validation"),
                 exp_dir=exp_dir) as trainer:
        trainer.train(print_interval=100, summary_interval=100,
                      val_interval=1)
    print(f"TRAINER_OK {pid}", flush=True)
    jax.distributed.shutdown()


def main():
    if sys.argv[1] == "trainer":
        return main_trainer(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                            sys.argv[5], sys.argv[6])
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.parallel import distributed
    from voxelnet_tpu.training import create_train_state, make_train_step
    from voxelnet_tpu.training.optim import make_optimizer

    distributed.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == DEV_PER_PROC * nproc
    assert len(jax.local_devices()) == DEV_PER_PROC

    config = tiny_config(nproc)
    mesh = distributed.make_multihost_mesh(
        num_dcn=nproc, num_data=DEV_PER_PROC, num_model=1)
    # every 'data'/'model' sub-grid must be process-local (ICI-only)
    for slice_devs in mesh.devices:
        assert len({d.process_index for d in slice_devs.ravel()}) == 1

    tx = make_optimizer(config, steps_per_epoch=10)
    # init on the local device, then replicate globally (every process
    # computes identical values from the same seed)
    with jax.default_device(jax.local_devices()[0]):
        state = create_train_state(config, tx, jax.random.key(0))
    repl = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), state)

    batch = global_batch(config)
    rows = GLOBAL_BATCH // nproc
    local = {k: v[pid * rows:(pid + 1) * rows] for k, v in batch.items()}
    staged = distributed.stage_global_batch(
        mesh, local, global_batch_size=GLOBAL_BATCH)

    step = make_train_step(config, tx, donate=False, mesh=mesh)
    state, metrics = step(state, staged)
    loss = float(jax.device_get(metrics["loss"]))
    gnorm = float(jax.device_get(metrics["grad_norm"]))
    assert np.isfinite(loss)
    # EVERY process reports — the parent asserts cross-process agreement
    # (the DCN gradient all-reduce must leave all replicas in lockstep)
    print(f"LOSS {loss:.8f} GRADNORM {gnorm:.8f} PID {pid}", flush=True)

    # --- stage 2: the PRODUCTION train resolves under the multi-host
    # mesh — wpack2 middle + planar-T Pallas table build (shard_mapped
    # over ('dcn', 'data'), interpret off-TPU) + dsplit BEV fold — the
    # same graph 'auto' picks on the chip, like the single-process
    # dryrun_multichip stage 2 (VERDICT r04 #8) ---
    prod_cfg = get_config(
        "Car",
        system={"num_dcn_shards": nproc, "num_data_shards": DEV_PER_PROC,
                "num_model_shards": 1},
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 2048, "max_voxels": 256, "max_gt_boxes": 8,
              "middle_backend": "wpack2", "train_vfe_backend": "planar",
              "bev_fold": "dsplit"},
        train={"batch_size": GLOBAL_BATCH, "compute_dtype": "float32"},
    )
    tx2 = make_optimizer(prod_cfg, steps_per_epoch=10)
    with jax.default_device(jax.local_devices()[0]):
        state2 = create_train_state(prod_cfg, tx2, jax.random.key(0))
    state2 = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), state2)
    step2 = make_train_step(prod_cfg, tx2, donate=False, mesh=mesh)
    state2, m2 = step2(state2, staged)
    ploss = float(jax.device_get(m2["loss"]))
    pgnorm = float(jax.device_get(m2["grad_norm"]))
    assert np.isfinite(ploss)
    print(f"PRODLOSS {ploss:.8f} PRODGRADNORM {pgnorm:.8f} PID {pid} "
          "RESOLVES middle=wpack2 vfe=planar fold=dsplit", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
