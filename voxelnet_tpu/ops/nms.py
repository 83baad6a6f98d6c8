"""Fixed-shape, on-device non-maximum suppression.

The reference's NMS is a serial PyTorch sort/gather loop over a
data-dependent candidate set (voxelnet/utils.py:492-553) driven from a NumPy
score threshold on the host (voxelnet/model.py:28-57). TPU redesign: a
static top-k candidate set, a (k, k) IoU matrix (axis-aligned or exact
rotated-BEV), and a greedy suppression sweep as a `fori_loop` — the whole
detector stays one jitted graph with no host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from voxelnet_tpu.ops import iou as iou_ops


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (post_topk, 7) lidar boxes
    scores: jnp.ndarray   # (post_topk,)
    valid: jnp.ndarray    # (post_topk,) bool


def _top_k(scores: jnp.ndarray, k: int, platform: str | None = None):
    """Exact top-k of the gated score vector.

    On TPU, `lax.top_k` lowers to a full sort (measured 43.9 ms for
    B8 x 140800 -> 256 on v5e); `lax.approx_max_k` with
    recall_target=1.0 runs the two-phase PartialReduce custom call at
    4.1 ms for the same shape and returns the exact top-k (verified
    value- AND index-identical on random data; ties may order
    differently from top_k's lowest-index rule, which only matters for
    exactly-equal f32 scores). Other backends keep lax.top_k.
    `platform` keys the choice to the devices that will execute
    (parallel.execution_platform resolves None from the ambient mesh /
    default backend)."""
    from voxelnet_tpu.parallel import execution_platform

    if execution_platform(platform=platform) == "tpu":
        return jax.lax.approx_max_k(scores, k, recall_target=1.0)
    return jax.lax.top_k(scores, k)


def _greedy_suppress(iou_mat: jnp.ndarray, order_valid: jnp.ndarray,
                     thresh: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates, as a vectorized fixpoint.

    iou_mat: (k, k) IoU between candidates already sorted by descending
    score. Returns the exact greedy (k,) keep mask.

    A literal k-step sequential sweep is latency-bound on TPU (~750 ms for
    k=512 here). Instead iterate keep <- "no higher-ranked KEPT candidate
    overlaps me" from an all-true start: each sweep is one (k, k) masked
    matmul-shaped reduction, and the iteration provably converges to the
    greedy solution in at most the depth of the longest suppression chain
    (single digits on real detections). The while_loop stops at the exact
    fixpoint.
    """
    k = iou_mat.shape[0]
    over = (iou_mat > thresh) & (
        jnp.arange(k)[:, None] < jnp.arange(k)[None, :])  # j suppresses i>j

    def cond(state):
        keep, prev_keep, it = state
        return (it < k) & jnp.any(keep != prev_keep)

    def body(state):
        keep, _, it = state
        suppressed = (over & keep[:, None]).any(axis=0)
        new_keep = order_valid & ~suppressed
        return new_keep, keep, it + 1

    init = order_valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (init, jnp.zeros_like(init), jnp.int32(0)))
    return keep


def nms_bev(boxes3d: jnp.ndarray, scores: jnp.ndarray, *,
            score_thresh: float, iou_thresh: float,
            pre_topk: int, post_topk: int,
            mode: str = "rotated",
            platform: str | None = None) -> NMSResult:
    """Score-threshold + BEV NMS for one frame, all static shapes.

    Args:
      boxes3d: (A, 7) decoded lidar boxes (x, y, z, h, w, l, r).
      scores: (A,) objectness probabilities.
      mode: 'rotated' — exact rotated-rectangle IoU (upgrade over the
        reference); 'standup' — axis-aligned IoU of the AABB of the rotated
        corners, matching voxelnet/model.py:39-48.
      platform: execution platform for the top-k lowering choice (None =
        ambient mesh / default backend).

    Returns post_topk boxes/scores with a validity mask (False entries are
    padding — either below the score threshold or suppressed).
    """
    scores = scores.astype(jnp.float32)
    eligible = scores >= score_thresh
    gated = jnp.where(eligible, scores, -1.0)

    pre_topk = min(pre_topk, scores.shape[0])
    top_scores, top_idx = _top_k(gated, pre_topk, platform)
    cand = boxes3d[top_idx].astype(jnp.float32)        # (k, 7)
    cand_valid = top_scores >= score_thresh

    bev = cand[:, jnp.asarray([0, 1, 4, 5, 6])]        # (k, 5) x, y, w, l, r
    if mode == "rotated":
        mat = iou_ops.rotated_iou(bev, bev)
    elif mode == "standup":
        standup = iou_ops.corners_to_standup(iou_ops.bev_corners(bev))
        mat = iou_ops.standup_iou(standup, standup)
    else:
        raise ValueError(f"unknown NMS mode {mode!r}")

    keep = _greedy_suppress(mat, cand_valid, iou_thresh)

    # compact the kept candidates to the front (stable by score order)
    rank = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, post_topk)
    out_boxes = jnp.zeros((post_topk, 7), jnp.float32).at[rank].set(
        cand, mode="drop")
    out_scores = jnp.zeros((post_topk,), jnp.float32).at[rank].set(
        top_scores, mode="drop")
    out_valid = jnp.zeros((post_topk,), jnp.bool_).at[rank].set(
        True, mode="drop")
    return NMSResult(out_boxes, out_scores, out_valid)
