"""The reference-named API surface exists and behaves."""

import numpy as np
import pytest

from voxelnet_tpu import reference_api as ref


def test_cfg_defaults():
    cfg = ref.get_cfg_defaults()
    assert cfg.object.name == "Car"
    assert cfg.object.grid_size == (10, 400, 352)


def test_pcl_to_voxels_buffers():
    rng = np.random.default_rng(0)
    pcl = np.concatenate([
        rng.uniform([0, -40, -3], [70.4, 40, 1], (3000, 3)),
        rng.uniform(0, 1, (3000, 1))], axis=1).astype(np.float32)
    vox = ref.pcl_to_voxels(pcl, "Car")
    K = vox["coordinate_buffer"].shape[0]
    assert vox["feature_buffer"].shape == (K, 35, 7)
    assert vox["number_buffer"].shape == (K,)
    assert vox["number_buffer"].dtype == np.int64
    assert vox["number_buffer"].sum() <= 3000


def test_generate_anchors_and_decode():
    anchors = ref.generate_anchors("Car")
    assert anchors.shape == (200, 176, 2, 7)
    deltas = np.zeros((1, 200, 176, 14), np.float32)
    boxes = ref.deltas_to_boxes_3d(deltas, anchors)
    assert boxes.shape == (1, 70400, 7)
    np.testing.assert_allclose(boxes[0], anchors.reshape(-1, 7), atol=1e-5)


def test_nms_and_smooth_l1():
    boxes = np.array([[10, 0, -1, 1.5, 1.6, 3.9, 0.0],
                      [10.1, 0, -1, 1.5, 1.6, 3.9, 0.0],
                      [30, 5, -1, 1.5, 1.6, 3.9, 0.0]], np.float32)
    kept, scores = ref.nms(boxes, np.array([0.9, 0.8, 0.7], np.float32))
    assert len(kept) == 2

    out = ref.smooth_L1_loss(np.array([1.0]), np.array([0.0]))
    assert out[0] == pytest.approx(1.0 - 0.5 / 9.0, abs=1e-6)


def test_generate_targets_reference_signature():
    labels = [[
        "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
        "-0.65 1.71 46.70 -1.59\n",
    ]]
    anchors = ref.generate_anchors("Car")
    pos, neg, tgt = ref.generate_targets(labels, (200, 176), anchors)
    assert pos.shape == (1, 200, 176, 2)
    assert neg.shape == (1, 200, 176, 2)
    assert tgt.shape == (1, 200, 176, 14)
    assert pos.sum() >= 1
    assert neg.sum() > 60000
