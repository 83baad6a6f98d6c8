"""Golden tests for the KITTI AP evaluation (the component the reference
left as an empty stub, voxelnet/eval.py:1-9)."""

import numpy as np
import pytest

from voxelnet_tpu.training.evaluate import (
    GroundTruth, box3d_iou, evaluate_ap, parse_gt_for_eval)


def _gt(boxes, heights=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    n = len(boxes)
    return GroundTruth(
        boxes_lidar=boxes,
        bbox_height=np.asarray(heights if heights is not None
                               else [100.0] * n, np.float32),
        occlusion=np.zeros(n, np.int32),
        truncation=np.zeros(n, np.float32))


BOX = [10.0, 0.0, -1.0, 1.5, 1.6, 3.9, 0.0]


def test_box3d_iou_identity_and_shift():
    b = np.asarray(BOX, np.float32)
    assert box3d_iou(b, b, "3d") == pytest.approx(1.0, abs=1e-4)
    assert box3d_iou(b, b, "bev") == pytest.approx(1.0, abs=1e-4)
    shifted = b.copy()
    shifted[2] += b[3]  # z-shift by full height: zero 3D overlap
    assert box3d_iou(b, shifted, "3d") == 0.0
    assert box3d_iou(b, shifted, "bev") == pytest.approx(1.0, abs=1e-4)


def test_perfect_detection_ap_is_one():
    frames = [{
        "pred_boxes": np.asarray([BOX], np.float32),
        "pred_scores": np.asarray([0.9], np.float32),
        "gt": _gt([BOX]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(1.0)


def test_miss_and_false_positive():
    far = [50.0, 20.0, -1.0, 1.5, 1.6, 3.9, 0.0]
    frames = [{
        "pred_boxes": np.asarray([far], np.float32),   # FP only
        "pred_scores": np.asarray([0.9], np.float32),
        "gt": _gt([BOX]),                              # missed GT
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == 0.0


def test_half_precision_recall():
    """2 GT, 1 TP at rank 1 + 1 FP at rank 2: 11-pt AP = recall 0.5
    plateau at precision 1.0 -> 6/11."""
    frames = [{
        "pred_boxes": np.asarray([BOX, [50, 20, -1, 1.5, 1.6, 3.9, 0]],
                                 np.float32),
        "pred_scores": np.asarray([0.9, 0.8], np.float32),
        "gt": _gt([BOX, [30, -10, -1, 1.5, 1.6, 3.9, 0]]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(6 / 11, abs=1e-6)


def test_dont_care_matches_are_ignored():
    """A prediction matched to a GT below the difficulty bar is dropped,
    not counted as FP."""
    hard_gt = [30.0, -10.0, -1.0, 1.5, 1.6, 3.9, 0.0]
    frames = [{
        "pred_boxes": np.asarray([BOX, hard_gt], np.float32),
        "pred_scores": np.asarray([0.9, 0.8], np.float32),
        # second GT has tiny bbox height -> excluded from 'easy'
        "gt": _gt([BOX, hard_gt], heights=[100.0, 10.0]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d",
                     difficulties=("easy",))
    assert ap["easy"] == pytest.approx(1.0)


def test_parse_gt_for_eval():
    lines = [
        "Car 0.10 1 -1.58 587.01 143.33 614.12 200.12 1.65 1.67 3.64 "
        "-0.65 1.71 46.70 -1.59\n",
        "DontCare -1 -1 -10 0 0 10 10 -1 -1 -1 -1000 -1000 -1000 -10\n",
    ]
    gt = parse_gt_for_eval(lines, "Car")
    assert gt.boxes_lidar.shape == (1, 7)
    assert gt.bbox_height[0] == pytest.approx(200.12 - 143.33)
    assert gt.occlusion[0] == 1
    assert gt.truncation[0] == pytest.approx(0.10)
