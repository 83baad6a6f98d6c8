"""Test environment: 8 virtual CPU devices so mesh/pjit logic is testable
without a TPU pod (SURVEY.md §4 — the TPU analog of a fake backend)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var in this image;
# forcing via config makes the suite run on the 8 virtual CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8, jax.devices()

# --- quick tier (`-m quick`): a <5-min core so commits can be gated fast;
# the compile-heavy model/train/sharding modules dominate the ~50-min full
# suite and run once per round instead ---
_QUICK_MODULES = {
    "test_config", "test_geometry", "test_kitti_io", "test_data",
    "test_evaluate", "test_tools", "test_ops", "test_raw_drive",
    "test_raw_to_kitti", "test_reference_api",
}
_QUICK_TESTS = {
    # one voxelizer compile + the no-recompile invariant, one train smoke
    ("test_voxelize", "test_jax_matches_np"),
    ("test_voxelize", "test_no_recompile_across_counts"),
    ("test_train", "test_train_step_decreases_loss"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in _QUICK_MODULES or (mod, name) in _QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def tiny_config():
    """Full pipeline config with a shrunken grid (10 x 64 x 64 voxels,
    32 x 64 anchor map) so CPU compiles stay fast."""
    from voxelnet_tpu.config import get_config

    return get_config(
        "Car",
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 2048, "max_voxels": 256, "max_gt_boxes": 8},
        train={"batch_size": 2},
    )


@pytest.fixture(scope="session")
def tiny_batch(tiny_config):
    """Deterministic synthetic batch matching tiny_config shapes."""
    rng = np.random.default_rng(0)
    B = tiny_config.train.batch_size
    n = 1500
    pts = np.concatenate([
        rng.uniform([0.0, -6.4, -3.0], [12.8, 6.4, 1.0], (B, n, 3)),
        rng.uniform(0.0, 1.0, (B, n, 1)),
    ], axis=-1).astype(np.float32)
    points = np.zeros((B, tiny_config.data.max_points, 4), np.float32)
    points[:, :n] = pts
    gt = np.zeros((B, tiny_config.data.max_gt_boxes, 7), np.float32)
    gt[:, 0] = [6.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
    gt_mask = np.zeros((B, tiny_config.data.max_gt_boxes), bool)
    gt_mask[:, 0] = True
    return {
        "points": points,
        "num_points": np.full((B,), n, np.int32),
        "gt_boxes": gt,
        "gt_mask": gt_mask,
    }


@pytest.fixture(scope="session")
def tiny_state(tiny_config):
    import jax

    from voxelnet_tpu.training import create_train_state
    from voxelnet_tpu.training.optim import make_optimizer

    tx = make_optimizer(tiny_config, steps_per_epoch=10)
    return create_train_state(tiny_config, tx, jax.random.key(0)), tx
