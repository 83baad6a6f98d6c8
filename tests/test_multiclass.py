"""Pedestrian / Cyclist configurations end-to-end (BASELINE config 5 lane).

The reference hard-switches the class at import time (voxelnet/config.py:37)
and its non-Car RPN would not even produce target-shaped maps (stride-1
block1, voxelnet/model.py:221-227 — SURVEY.md §2). Here every class preset
must build, train a step, and keep anchor-map shapes consistent.
"""

import jax
import numpy as np
import pytest

from voxelnet_tpu.config import get_config
from voxelnet_tpu.training import create_train_state, make_train_step
from voxelnet_tpu.training.optim import make_optimizer


@pytest.mark.parametrize("cls_name", ["Pedestrian", "Cyclist"])
def test_nonscar_class_train_step(cls_name):
    cfg = get_config(
        cls_name,
        object={"x_max": 9.6, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 1024, "max_voxels": 128, "max_gt_boxes": 4},
        train={"batch_size": 1},
    )
    assert cfg.object.points_per_voxel == 45
    hp, wp = cfg.object.feature_height, cfg.object.feature_width
    assert (hp, wp) == (cfg.object.height // 2, cfg.object.width // 2)

    tx = make_optimizer(cfg, steps_per_epoch=5)
    state = create_train_state(cfg, tx, jax.random.key(0))
    step = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    B, n = 1, 800
    pts = np.zeros((B, cfg.data.max_points, 4), np.float32)
    pts[:, :n] = np.concatenate([
        rng.uniform([0, -6.4, -3], [9.6, 6.4, 1], (B, n, 3)),
        rng.uniform(0, 1, (B, n, 1))], axis=-1)
    gt = np.zeros((B, 4, 7), np.float32)
    gt[:, 0] = [5.0, 0.0, -1.0, cfg.object.anchor_h, cfg.object.anchor_w,
                cfg.object.anchor_l, 0.0]
    mask = np.zeros((B, 4), bool)
    mask[:, 0] = True
    batch = {"points": pts, "num_points": np.full((B,), n, np.int32),
             "gt_boxes": gt, "gt_mask": mask}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_full_size_class_grids():
    ped = get_config("Pedestrian")
    assert ped.object.grid_size == (10, 200, 240)
    assert (ped.object.feature_height, ped.object.feature_width) == (100, 120)
    car = get_config("Car")
    assert car.object.num_anchors == 70400
    assert ped.object.num_anchors == 100 * 120 * 2
