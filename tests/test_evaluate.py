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


def test_iou_np_matches_device_kernel():
    """ops.iou_np (host eval path) must agree with ops.iou (device path)."""
    import jax.numpy as jnp

    from voxelnet_tpu.ops import iou as iou_jax
    from voxelnet_tpu.ops.iou_np import rotated_iou_np

    rng = np.random.default_rng(7)
    n, k = 23, 17
    b1 = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                   rng.uniform(0.5, 3, n), rng.uniform(0.5, 5, n),
                   rng.uniform(-np.pi, np.pi, n)], axis=1)
    b2 = np.stack([rng.uniform(-20, 20, k), rng.uniform(-20, 20, k),
                   rng.uniform(0.5, 3, k), rng.uniform(0.5, 5, k),
                   rng.uniform(-np.pi, np.pi, k)], axis=1)
    # overlap some pairs deliberately
    b2[:5, :2] = b1[:5, :2] + rng.uniform(-1, 1, (5, 2))
    got = rotated_iou_np(b1, b2)
    want = np.asarray(iou_jax.rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ap_40_point():
    """1 TP + 1 FP over 2 GT: recall plateau 0.5 at precision 1.0.
    40-point AP = 20/40 (no r=0 sample, unlike 11-point's 6/11)."""
    frames = [{
        "pred_boxes": np.asarray([BOX, [50, 20, -1, 1.5, 1.6, 3.9, 0]],
                                 np.float32),
        "pred_scores": np.asarray([0.9, 0.8], np.float32),
        "gt": _gt([BOX, [30, -10, -1, 1.5, 1.6, 3.9, 0]]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d", num_points=40)
    assert ap["moderate"] == pytest.approx(0.5, abs=1e-6)


def test_small_detection_neither_tp_nor_fp():
    """Devkit rule: a detection whose projected 2D height is below the
    difficulty's min height is dropped from the PR curve, not an FP."""
    far = [50.0, 20.0, -1.0, 1.5, 1.6, 3.9, 0.0]
    frames = [{
        "pred_boxes": np.asarray([BOX, far], np.float32),
        "pred_scores": np.asarray([0.9, 0.8], np.float32),
        "pred_heights": np.asarray([100.0, 10.0], np.float32),  # far is tiny
        "gt": _gt([BOX]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(1.0)
    # without the heights the far box is a plain FP -> AP stays 1.0 only
    # because it ranks below the TP; flip scores to prove the rule matters
    frames[0]["pred_scores"] = np.asarray([0.8, 0.9], np.float32)
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(1.0)
    del frames[0]["pred_heights"]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] < 1.0


def test_small_detection_cannot_steal_gt():
    """A small (ignored) detection that overlaps a care GT must not block
    a real detection from matching it."""
    frames = [{
        "pred_boxes": np.asarray([BOX, BOX], np.float32),
        "pred_scores": np.asarray([0.95, 0.5], np.float32),
        "pred_heights": np.asarray([10.0, 100.0], np.float32),
        "gt": _gt([BOX]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(1.0)


def test_aos_perfect_and_flipped():
    gt = _gt([BOX])
    gt.alpha = np.asarray([0.3], np.float32)
    frames = [{
        "pred_boxes": np.asarray([BOX], np.float32),
        "pred_scores": np.asarray([0.9], np.float32),
        "pred_alphas": np.asarray([0.3], np.float32),
        "gt": gt,
    }]
    res = evaluate_ap(frames, iou_thresh=0.7, mode="3d", compute_aos=True)
    assert res["moderate_aos"] == pytest.approx(res["moderate"])
    frames[0]["pred_alphas"] = np.asarray([0.3 + np.pi], np.float32)
    res = evaluate_ap(frames, iou_thresh=0.7, mode="3d", compute_aos=True)
    assert res["moderate_aos"] == pytest.approx(0.0, abs=1e-6)


def test_eval_speed_vectorized():
    """Full-frame matching must be matrix-driven: 100 frames x (64 pred,
    32 gt) in well under a second (the round-1 per-pair Python loop took
    minutes at this scale)."""
    import time

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(100):
        p, g = 64, 32
        gt_boxes = np.stack([
            rng.uniform(0, 70, g), rng.uniform(-40, 40, g),
            np.full(g, -1.0), np.full(g, 1.5), np.full(g, 1.6),
            np.full(g, 3.9), rng.uniform(-np.pi, np.pi, g)], 1)
        pred = gt_boxes[rng.integers(0, g, p)] + rng.normal(0, 0.3, (p, 7))
        frames.append({
            "pred_boxes": pred.astype(np.float32),
            "pred_scores": rng.uniform(0, 1, p).astype(np.float32),
            "gt": _gt(gt_boxes),
        })
    t0 = time.perf_counter()
    evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert time.perf_counter() - t0 < 5.0


def test_empty_gt_frame_with_predictions_counts_fp():
    """A frame with zero GT but predictions must not crash and must
    count the predictions as FPs (regression: IndexError on size-0
    care array)."""
    frames = [
        {"pred_boxes": np.asarray([BOX], np.float32),
         "pred_scores": np.asarray([0.9], np.float32),
         "gt": _gt(np.zeros((0, 7)))},
        {"pred_boxes": np.asarray([BOX], np.float32),
         "pred_scores": np.asarray([0.8], np.float32),
         "gt": _gt([BOX])},
    ]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    # rank 1 FP, rank 2 TP: precision at full recall = 1/2 -> 11-pt AP
    assert ap["moderate"] == pytest.approx(0.5, abs=0.05)


def test_care_gt_takes_priority_over_ignored_neighbor():
    """Devkit assignment: an ignored neighbor-class GT (Van) must not
    steal a detection that also matches the care GT above threshold,
    even when the Van IoU is higher."""
    van = list(BOX)
    van[0] += 0.3          # overlaps BOX heavily
    det = list(BOX)
    det[0] += 0.25         # IoU(det, van) > IoU(det, car) > thresh
    gt = _gt([BOX, van])
    gt.ignored[1] = True
    frames = [{
        "pred_boxes": np.asarray([det], np.float32),
        "pred_scores": np.asarray([0.9], np.float32),
        "gt": gt,
    }]
    ap = evaluate_ap(frames, iou_thresh=0.5, mode="bev")
    assert ap["moderate"] == pytest.approx(1.0)


def test_dontcare_region_absorbs_unmatched_detection():
    """An unmatched detection whose 2D box lies in a DontCare region is
    neither TP nor FP (devkit boxoverlap rule)."""
    far = [50.0, 20.0, -1.0, 1.5, 1.6, 3.9, 0.0]
    gt = _gt([BOX])
    gt.dontcare = np.asarray([[100, 100, 200, 200]], np.float32)
    frames = [{
        "pred_boxes": np.asarray([BOX, far], np.float32),
        "pred_scores": np.asarray([0.8, 0.9], np.float32),
        "pred_heights": np.asarray([80.0, 80.0], np.float32),
        # the far FP sits fully inside the DontCare region
        "pred_boxes2d": np.asarray([[400, 50, 460, 130],
                                    [120, 120, 180, 200]], np.float32),
        "gt": gt,
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap["moderate"] == pytest.approx(1.0)   # FP was absorbed
    gt2 = _gt([BOX])  # without the DontCare region the FP counts
    frames[0]["gt"] = gt2
    ap2 = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    assert ap2["moderate"] < 1.0


def test_small_matched_detection_removes_gt_from_denominator():
    """A care GT consumed by a below-min-height detection counts
    neither TP nor FN (devkit: GT leaves the denominator)."""
    other = list(BOX)
    other[0] += 20.0
    frames = [{
        "pred_boxes": np.asarray([BOX, other], np.float32),
        "pred_scores": np.asarray([0.9, 0.8], np.float32),
        # first det matches its GT but is too small to count
        "pred_heights": np.asarray([10.0, 80.0], np.float32),
        "gt": _gt([BOX, other]),
    }]
    ap = evaluate_ap(frames, iou_thresh=0.7, mode="3d")
    # remaining: 1 GT, 1 TP -> perfect AP (not 0.5-recall-capped)
    assert ap["moderate"] == pytest.approx(1.0)
