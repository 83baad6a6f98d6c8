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
    corners = iou.bev_corners(bev)                   # (G, 4, 2)
    return jnp.stack([
        corners[..., 0].min(axis=-1), corners[..., 1].min(axis=-1),
        corners[..., 0].max(axis=-1), corners[..., 1].max(axis=-1),
    ], axis=-1)


def assign_targets(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                   anchors: jnp.ndarray, anchors_standup: jnp.ndarray,
                   *, pos_iou: float, neg_iou: float, anchor_h: float,
                   iou_plus_one: bool = False) -> TargetAssignment:
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
    deltas = box_coding.encode_boxes(matched, anchors, anchor_h)
    reg_targets = deltas * pos[:, None]
    return TargetAssignment(pos, neg, reg_targets)


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
