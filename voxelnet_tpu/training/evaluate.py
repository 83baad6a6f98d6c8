"""KITTI 3D / BEV average precision evaluation.

The reference left evaluation empty (voxelnet/eval.py:1-9 is a stub; label
files were dumped for the external KITTI devkit, voxelnet/train.py:224-232).
This implements the devkit's metric in Python so AP is measurable in-repo:
11-point interpolated AP at a given IoU threshold over the KITTI difficulty
buckets (easy/moderate/hard by 2D box height, occlusion, truncation), with
rotated-BEV or full-3D IoU.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from voxelnet_tpu.data.augment import rotated_iou_2d

# KITTI devkit difficulty thresholds:
#   min 2D bbox height (px), max occlusion level, max truncation
DIFFICULTY = {
    "easy": (40.0, 0, 0.15),
    "moderate": (25.0, 1, 0.30),
    "hard": (25.0, 2, 0.50),
}


# KITTI devkit "neighboring classes": detections matched to these are
# neither TPs nor FPs, and they never count toward num_gt.
IGNORED_NEIGHBORS = {"Car": ("Van",), "Pedestrian": ("Person_sitting",)}


@dataclass
class GroundTruth:
    boxes_lidar: np.ndarray   # (N, 7)
    bbox_height: np.ndarray   # (N,) 2D box height in px
    occlusion: np.ndarray     # (N,) int
    truncation: np.ndarray    # (N,) float
    ignored: np.ndarray = None  # (N,) bool — neighboring-class boxes

    def __post_init__(self):
        if self.ignored is None:
            self.ignored = np.zeros(len(self.boxes_lidar), bool)


def parse_gt_for_eval(label_lines, cls_name="Car",
                      T_VELO_2_CAM=None, R_RECT_0=None) -> GroundTruth:
    """Parse one frame's label lines keeping difficulty metadata.

    Neighboring classes (Van for Car, Person_sitting for Pedestrian) are
    kept but flagged `ignored`: the devkit neither requires nor penalizes
    detecting them.
    """
    from voxelnet_tpu.utils import geometry

    neighbors = IGNORED_NEIGHBORS.get(cls_name, ())
    acc = (cls_name,) + tuple(neighbors)
    rows, hts, occ, trunc, ign = [], [], [], [], []
    for line in label_lines:
        f = line.split()
        if not f or f[0] not in acc:
            continue
        h, w, l, x, y, z, r = (float(v) for v in f[8:15])
        rows.append((x, y, z, h, w, l, r))
        hts.append(float(f[7]) - float(f[5]))   # y2 - y1
        occ.append(int(float(f[2])))
        trunc.append(float(f[1]))
        ign.append(f[0] in neighbors)
    cam = np.asarray(rows, np.float32).reshape(-1, 7)
    lidar = (geometry.camera_to_lidar_boxes(cam, T_VELO_2_CAM, R_RECT_0)
             .astype(np.float32) if len(cam) else cam)
    return GroundTruth(lidar, np.asarray(hts, np.float32),
                       np.asarray(occ, np.int32),
                       np.asarray(trunc, np.float32),
                       np.asarray(ign, bool))


def box3d_iou(box1: np.ndarray, box2: np.ndarray, mode: str = "3d") -> float:
    """IoU of two (x, y, z, h, w, l, r) lidar boxes.

    mode='bev' — rotated BEV IoU; mode='3d' — BEV intersection x z-overlap.
    z is the box bottom (lidar convention).
    """
    bev1, bev2 = box1[[0, 1, 4, 5, 6]], box2[[0, 1, 4, 5, 6]]
    bev_iou = rotated_iou_2d(bev1, bev2)
    if mode == "bev":
        return bev_iou
    # recover BEV intersection area from IoU
    a1, a2 = box1[4] * box1[5], box2[4] * box2[5]
    inter_bev = bev_iou * (a1 + a2) / (1.0 + bev_iou)
    z_overlap = max(
        0.0,
        min(box1[2] + box1[3], box2[2] + box2[3]) - max(box1[2], box2[2]))
    inter = inter_bev * z_overlap
    vol1, vol2 = a1 * box1[3], a2 * box2[3]
    union = vol1 + vol2 - inter
    return float(inter / union) if union > 0 else 0.0


def _frame_matches(pred_boxes, pred_scores, gt_boxes, iou_thresh, mode):
    """Greedy score-ordered matching; returns (tp_flags, matched_gt_idx)."""
    order = np.argsort(-np.asarray(pred_scores))
    matched = np.zeros(len(gt_boxes), bool)
    tp = np.zeros(len(pred_boxes), bool)
    gt_idx = np.full(len(pred_boxes), -1, np.int32)
    for pi in order:
        best, best_iou = -1, iou_thresh
        for gi in range(len(gt_boxes)):
            if matched[gi]:
                continue
            ov = box3d_iou(pred_boxes[pi], gt_boxes[gi], mode)
            if ov >= best_iou:
                best, best_iou = gi, ov
        if best >= 0:
            matched[best] = True
            tp[pi] = True
            gt_idx[pi] = best
    return tp, gt_idx


def evaluate_ap(frames: list[dict], iou_thresh: float = 0.7,
                mode: str = "3d",
                difficulties=("easy", "moderate", "hard")) -> dict:
    """Compute AP over frames.

    Each frame dict: pred_boxes (P, 7), pred_scores (P,), gt (GroundTruth).
    Returns {difficulty: AP} with 11-point interpolation (KITTI devkit
    metric for the numbers the VoxelNet paper reports).
    """
    results = {}
    for diff in difficulties:
        min_h, max_occ, max_trunc = DIFFICULTY[diff]
        scores_all, tp_all, num_gt = [], [], 0
        for fr in frames:
            gt: GroundTruth = fr["gt"]
            care = ((gt.bbox_height >= min_h)
                    & (gt.occlusion <= max_occ)
                    & (gt.truncation <= max_trunc)
                    & ~gt.ignored)
            num_gt += int(care.sum())
            pred_boxes = np.asarray(fr["pred_boxes"]).reshape(-1, 7)
            pred_scores = np.asarray(fr["pred_scores"]).reshape(-1)
            if len(pred_boxes) == 0:
                continue
            tp, gt_idx = _frame_matches(
                pred_boxes, pred_scores, gt.boxes_lidar, iou_thresh, mode)
            # predictions matched to don't-care GT are dropped, not FPs
            ignore = np.zeros(len(pred_boxes), bool)
            for pi in range(len(pred_boxes)):
                if tp[pi] and not care[gt_idx[pi]]:
                    ignore[pi] = True
            keep = ~ignore
            scores_all.append(pred_scores[keep])
            tp_all.append(tp[keep] & np.array(
                [care[g] if g >= 0 else False for g in gt_idx[keep]]))
        if num_gt == 0:
            results[diff] = float("nan")
            continue
        if not scores_all:
            results[diff] = 0.0
            continue
        scores = np.concatenate(scores_all)
        tps = np.concatenate(tp_all)
        order = np.argsort(-scores)
        tps = tps[order]
        cum_tp = np.cumsum(tps)
        recall = cum_tp / num_gt
        precision = cum_tp / (np.arange(len(tps)) + 1)
        ap = 0.0
        for r in np.linspace(0, 1, 11):
            mask = recall >= r
            ap += (precision[mask].max() if mask.any() else 0.0) / 11
        results[diff] = float(ap)
    return results
