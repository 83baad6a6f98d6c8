"""On-device anchor target assignment.

The reference computes targets on the host with NumPy + pure-Python IoU
loops *inside every forward pass* (voxelnet/utils.py:344-473 called from
voxelnet/model.py:309) — the dominant training bottleneck. Here the whole
assignment is a vectorized, padded-GT jnp function that lives inside the
jitted train step:

  pos anchors = {IoU > pos_thresh}  ∪  {argmax anchor of each GT}
  neg anchors = {max IoU over GTs < neg_thresh}
  regression  = encoded deltas against each positive anchor's best GT

Deviation from the reference (documented, intended semantics): when an
anchor exceeds the threshold for several GTs the reference matches it to the
lowest-indexed one (an artifact of np.unique ordering, utils.py:421-425); we
match to the highest-IoU one. The reference's zero-area anchor standup bug
(utils.py:217-225) and +1 pixel IoU offsets are reproducible via flags.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from voxelnet_tpu.config import ObjectConfig
from voxelnet_tpu.ops import box_coding, iou
from voxelnet_tpu.utils import geometry


class TargetAssignment(NamedTuple):
    pos_mask: jnp.ndarray     # (A,) float32 0/1
    neg_mask: jnp.ndarray     # (A,) float32 0/1
    reg_targets: jnp.ndarray  # (A, 7) float32


def anchor_standup_np(obj: ObjectConfig, buggy: bool = False) -> np.ndarray:
    """Host-precomputed (A, 4) anchor standup boxes (constant per class)."""
    from voxelnet_tpu.ops.anchors import anchors_flat

    a = anchors_flat(obj)
    return geometry.anchor_to_standup_box2d(a[:, [0, 1, 4, 5]], buggy=buggy)


def gt_standup(gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """(G, 7) lidar GT boxes -> (G, 4) BEV standup boxes, on device.

    jnp analog of center_to_corner -> standup (voxelnet/utils.py:230-256).
    """
    bev = gt_boxes[:, jnp.asarray([0, 1, 4, 5, 6])]  # x, y, w, l, r
    return iou.corners_to_standup(iou.bev_corners(bev))


def assign_targets(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                   anchors: jnp.ndarray, anchors_standup: jnp.ndarray,
                   *, pos_iou: float, neg_iou: float, anchor_h: float,
                   iou_plus_one: bool = False,
                   yaw_mode: str = "delta") -> TargetAssignment:
    """Assign padded GT boxes to anchors for one frame.

    Args:
      gt_boxes: (G, 7) lidar boxes, padded.
      gt_mask: (G,) bool validity.
      anchors: (A, 7) flattened anchors (host constant).
      anchors_standup: (A, 4) anchor standup boxes (host constant).

    Fully static shapes; no data-dependent control flow.
    """
    A = anchors.shape[0]

    overlaps = iou.standup_iou(anchors_standup, gt_standup(gt_boxes),
                               plus_one=iou_plus_one)          # (A, G)
    overlaps = jnp.where(gt_mask[None, :], overlaps, -1.0)

    best_gt = jnp.argmax(overlaps, axis=1)                     # (A,)
    best_gt_iou = jnp.max(overlaps, axis=1)                    # (A,)

    # argmax anchor per GT (only GTs with some positive overlap,
    # voxelnet/utils.py:411-414)
    best_anchor = jnp.argmax(overlaps, axis=0)                 # (G,)
    best_anchor_iou = jnp.max(overlaps, axis=0)                # (G,)
    force_pos = jnp.zeros((A,), jnp.float32).at[
        jnp.where(gt_mask & (best_anchor_iou > 0), best_anchor, A)
    ].max(1.0, mode="drop")

    pos = jnp.maximum((best_gt_iou > pos_iou).astype(jnp.float32), force_pos)
    # neg: all valid-GT overlaps below the threshold (invalid GTs carry
    # overlap -1 so they never block). The reference leaves its
    # pos/neg-exclusivity fix commented out (voxelnet/utils.py:464-471) so an
    # anchor can be both; we keep them exclusive — the intended semantics.
    any_high = (overlaps >= neg_iou).any(axis=1)  # invalid GTs carry -1
    neg = (1.0 - any_high.astype(jnp.float32)) * (1.0 - pos)

    matched = gt_boxes[best_gt]                                # (A, 7)
    deltas = box_coding.encode_boxes(matched, anchors, anchor_h,
                                     yaw_mode=yaw_mode)
    reg_targets = deltas * pos[:, None]
    return TargetAssignment(pos, neg, reg_targets)


def assign_targets_np(gt_boxes: np.ndarray, gt_mask: np.ndarray,
                      anchors: np.ndarray, anchors_standup: np.ndarray,
                      *, pos_iou: float, neg_iou: float, anchor_h: float,
                      iou_plus_one: bool = False, yaw_mode: str = "delta"):
    """NumPy twin of `assign_targets` for host-side precompute.

    Target assignment depends only on (gt_boxes, anchors) — not on params —
    so the input-pipeline threads can compute it while the device runs the
    previous step, taking the (A, G) IoU + encode work out of the jitted
    train graph entirely. Semantics match `assign_targets` (equivalence
    test: tests/test_ops.py)."""
    from voxelnet_tpu.ops.iou_np import bev_corners_np

    A = anchors.shape[0]
    gt_boxes = np.asarray(gt_boxes, np.float32)
    gt_mask = np.asarray(gt_mask, bool)

    corners = bev_corners_np(gt_boxes[:, [0, 1, 4, 5, 6]])  # (G, 4, 2)
    gt_su = np.stack([
        corners[..., 0].min(-1), corners[..., 1].min(-1),
        corners[..., 0].max(-1), corners[..., 1].max(-1)], -1)

    off = 1.0 if iou_plus_one else 0.0
    b1 = anchors_standup[:, None, :].astype(np.float64)
    b2 = gt_su[None, :, :]
    iw = np.maximum(np.minimum(b1[..., 2], b2[..., 2])
                    - np.maximum(b1[..., 0], b2[..., 0]) + off, 0.0)
    ih = np.maximum(np.minimum(b1[..., 3], b2[..., 3])
                    - np.maximum(b1[..., 1], b2[..., 1]) + off, 0.0)
    inter = iw * ih
    a1 = ((b1[..., 2] - b1[..., 0] + off) * (b1[..., 3] - b1[..., 1] + off))
    a2 = ((b2[..., 2] - b2[..., 0] + off) * (b2[..., 3] - b2[..., 1] + off))
    union = a1 + a2 - inter
    overlaps = np.where(union > 0, inter / union, 0.0).astype(np.float32)
    overlaps = np.where(gt_mask[None, :], overlaps, -1.0)   # (A, G)

    best_gt = overlaps.argmax(1)
    best_gt_iou = overlaps.max(1)
    best_anchor = overlaps.argmax(0)
    best_anchor_iou = overlaps.max(0)
    force = best_anchor[gt_mask & (best_anchor_iou > 0)]
    pos = (best_gt_iou > pos_iou).astype(np.float32)
    pos[force] = 1.0
    any_high = (overlaps >= neg_iou).any(1)
    neg = (1.0 - any_high.astype(np.float32)) * (1.0 - pos)

    matched = gt_boxes[best_gt]                              # (A, 7)
    diag = np.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    dr = matched[:, 6:7] - anchors[:, 6:7]
    if yaw_mode == "sin":
        # wrap into [-pi/2, pi/2] modulo pi, then sin (see encode_boxes)
        dr = dr - np.pi * np.round(dr / np.pi)
        dr = np.sin(dr)
    elif yaw_mode != "delta":
        raise ValueError(f"yaw_mode={yaw_mode!r}")
    deltas = np.concatenate([
        (matched[:, 0:2] - anchors[:, 0:2]) / diag[:, None],
        (matched[:, 2:3] - anchors[:, 2:3]) / anchor_h,
        np.log(np.maximum(matched[:, 3:6], 1e-6) / anchors[:, 3:6]),
        dr], -1).astype(np.float32)
    reg_targets = deltas * pos[:, None]
    return pos, neg, reg_targets


class TargetPrecomputer:
    """Per-batch host target maps, matching `_compute_target_maps`.

    Attach to a batch iterator (e.g. LazyBatchIterator's transform) to add
    target_pos (B, H', W', 2), target_neg (B, H', W', 2) and target_reg
    (B, H', W', 14) so the jitted train step skips on-device assignment."""

    def __init__(self, config):
        from voxelnet_tpu.ops.anchors import anchors_flat

        obj = config.object
        self.anchors = np.asarray(anchors_flat(obj), np.float32)
        self.standup = np.asarray(anchor_standup_np(
            obj, buggy=config.compat.buggy_anchor_standup), np.float32)
        self.kw = dict(pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
                       anchor_h=obj.anchor_h,
                       iou_plus_one=config.compat.iou_plus_one,
                       yaw_mode=config.train.yaw_encoding)
        self.shape = (obj.feature_height, obj.feature_width)

    def __call__(self, batch: dict) -> dict:
        h, w = self.shape
        pos_l, neg_l, reg_l = [], [], []
        for gt_b, gt_m in zip(batch["gt_boxes"], batch["gt_mask"]):
            pos, neg, reg = assign_targets_np(
                gt_b, gt_m, self.anchors, self.standup, **self.kw)
            pos_l.append(pos.reshape(h, w, 2))
            neg_l.append(neg.reshape(h, w, 2))
            reg_l.append(reg.reshape(h, w, 14))
        batch["target_pos"] = np.stack(pos_l)
        batch["target_neg"] = np.stack(neg_l)
        batch["target_reg"] = np.stack(reg_l)
        return batch


def targets_to_maps(assignment: TargetAssignment,
                    feature_shape: tuple[int, int]):
    """(A,)/(A,7) -> RPN map layout (H', W', 2) and (H', W', 14).

    Anchor index order is row-major (H', W', 2), matching
    voxelnet/utils.py:428 (`np.unravel_index` over (*feature_map_shape, 2)).
    """
    h, w = feature_shape
    pos = assignment.pos_mask.reshape(h, w, 2)
    neg = assignment.neg_mask.reshape(h, w, 2)
    reg = assignment.reg_targets.reshape(h, w, 14)
    return pos, neg, reg
