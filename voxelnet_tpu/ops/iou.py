"""IoU kernels: axis-aligned (standup) and rotated-BEV, all on device.

The reference computes anchor/GT IoU with an O(N*K) pure-Python double loop
(voxelnet/utils.py:344-373) and sidesteps rotated IoU entirely by using the
AABB of rotated corners (voxelnet/model.py:39-48). Here both are fully
vectorized jnp: standup IoU as one broadcasted expression, rotated IoU as a
fixed-size Sutherland-Hodgman convex clip (max 8 vertices — the intersection
of two rectangles), vmapped over box pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_VERTS = 8  # rectangle ∩ rectangle has at most 8 vertices


# ---------------------------------------------------------------------------
# axis-aligned standup IoU
# ---------------------------------------------------------------------------

def standup_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                plus_one: bool = False) -> jnp.ndarray:
    """IoU between (N, 4) and (K, 4) standup boxes (x1, y1, x2, y2) -> (N, K).

    `plus_one=True` reproduces the reference's pixel-convention +1 on the
    extents (voxelnet/utils.py:350-371) — a quirk carried from image-space
    code; default is correct metric IoU. NOTE: the reference's union also
    uses `(y1 - x1 + 1)` for box1's width (utils.py:367-368, a transcription
    slip); we do not reproduce that — union uses real areas.
    """
    off = 1.0 if plus_one else 0.0
    b1 = boxes1[:, None, :]   # (N, 1, 4)
    b2 = boxes2[None, :, :]   # (1, K, 4)
    iw = (jnp.minimum(b1[..., 2], b2[..., 2])
          - jnp.maximum(b1[..., 0], b2[..., 0]) + off)
    ih = (jnp.minimum(b1[..., 3], b2[..., 3])
          - jnp.maximum(b1[..., 1], b2[..., 1]) + off)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area1 = ((boxes1[:, 2] - boxes1[:, 0] + off)
             * (boxes1[:, 3] - boxes1[:, 1] + off))
    area2 = ((boxes2[:, 2] - boxes2[:, 0] + off)
             * (boxes2[:, 3] - boxes2[:, 1] + off))
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


# ---------------------------------------------------------------------------
# rotated BEV IoU
# ---------------------------------------------------------------------------

def bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) BEV boxes (x, y, w, l, r) -> (..., 4, 2) CCW corners."""
    x, y, w, l, r = (boxes[..., i] for i in range(5))
    # CCW winding; matches the bottom-face template of
    # voxelnet/utils.py:596-599 restricted to 2D.
    sx = jnp.asarray([-0.5, -0.5, 0.5, 0.5], boxes.dtype)
    sy = jnp.asarray([0.5, -0.5, -0.5, 0.5], boxes.dtype)
    lx = l[..., None] * sx
    ly = w[..., None] * sy
    cos, sin = jnp.cos(r)[..., None], jnp.sin(r)[..., None]
    cx = cos * lx - sin * ly + x[..., None]
    cy = sin * lx + cos * ly + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _quad_intersection_area(c1, c2):
    """Intersection area of CCW quad batches c1, c2: (..., 4, 2) -> (...,).

    TPU-shaped algorithm — no dynamic gathers/scatters per pair (an earlier
    Sutherland-Hodgman formulation with per-pair scatter compaction ran
    ~1000x slower on TPU):

      1. candidate vertices = 16 edge-pair intersections + 4 vertices of
         each quad inside the other (24 candidates + validity mask),
      2. order candidates by angle around the valid-centroid with ONE
         batched argsort(24),
      3. masked shoelace: invalid entries are replaced by the first valid
         vertex so the static roll-by-one closes the polygon exactly.
    """
    eps = 1e-9
    dtype = c1.dtype

    # --- 1a. edge-pair intersections: edges a = c1[i]->c1[i+1], b likewise
    a0 = c1                                   # (..., 4, 2)
    a1 = jnp.roll(c1, -1, axis=-2)
    b0 = c2
    b1 = jnp.roll(c2, -1, axis=-2)

    # broadcast to (..., 4, 4, 2): a-edges x b-edges
    a0e = a0[..., :, None, :]
    a1e = a1[..., :, None, :]
    b0e = b0[..., None, :, :]
    b1e = b1[..., None, :, :]

    da = a1e - a0e
    db = b1e - b0e
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    diff = b0e - a0e
    t = (diff[..., 0] * db[..., 1] - diff[..., 1] * db[..., 0])
    u = (diff[..., 0] * da[..., 1] - diff[..., 1] * da[..., 0])
    safe = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    t = t / safe
    u = u / safe
    inter_valid = ((jnp.abs(denom) > eps)
                   & (t >= 0.0) & (t <= 1.0) & (u >= 0.0) & (u <= 1.0))
    inter_pts = a0e + t[..., None] * da          # (..., 4, 4, 2)
    inter_pts = inter_pts.reshape(*c1.shape[:-2], 16, 2)
    inter_valid = inter_valid.reshape(*c1.shape[:-2], 16)

    # --- 1b. vertices of one quad inside the other (CCW -> cross >= 0 for
    # every edge)
    def _inside(pts, quad):
        # pts (..., P, 2), quad (..., 4, 2) -> (..., P) bool
        q0 = quad[..., None, :, :]               # (..., 1, 4, 2)
        q1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
        d = q1 - q0
        rel = pts[..., :, None, :] - q0
        cross = d[..., 0] * rel[..., 1] - d[..., 1] * rel[..., 0]
        return (cross >= -eps).all(axis=-1)

    v1_in = _inside(c1, c2)                      # (..., 4)
    v2_in = _inside(c2, c1)

    cand = jnp.concatenate([inter_pts, c1, c2], axis=-2)   # (..., 24, 2)
    valid = jnp.concatenate([inter_valid, v1_in, v2_in], axis=-1)

    num_valid = valid.sum(axis=-1)
    any_valid = num_valid > 0
    vf = valid[..., None].astype(dtype)
    centroid = (cand * vf).sum(axis=-2) / jnp.maximum(
        num_valid[..., None], 1).astype(dtype)

    # --- 2. sort by angle around centroid (invalid -> +inf, sorted last)
    rel = cand - centroid[..., None, :]
    ang = jnp.where(valid, jnp.arctan2(rel[..., 1], rel[..., 0]), jnp.inf)
    order = jnp.argsort(ang, axis=-1)
    sorted_pts = jnp.take_along_axis(cand, order[..., None], axis=-2)
    sorted_valid = jnp.take_along_axis(valid, order, axis=-1)

    # --- 3. masked shoelace with invalid slots pinned to the first vertex
    first = sorted_pts[..., 0:1, :]
    closed = jnp.where(sorted_valid[..., None], sorted_pts, first)
    nxt = jnp.roll(closed, -1, axis=-2)
    contrib = (closed[..., 0] * nxt[..., 1] - nxt[..., 0] * closed[..., 1])
    area = 0.5 * jnp.abs(contrib.sum(axis=-1))
    return jnp.where(any_valid, area, 0.0)


def rotated_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Rotated-BEV IoU matrix between (N, 5) and (K, 5) boxes -> (N, K).

    Boxes are (x, y, w, l, r). Exact convex-polygon intersection, fully
    batched — the on-device upgrade over the reference's axis-aligned NMS
    approximation (voxelnet/model.py:39-48).
    """
    n, k = boxes1.shape[0], boxes2.shape[0]
    c1 = bev_corners(boxes1.astype(jnp.float32))
    c2 = bev_corners(boxes2.astype(jnp.float32))
    c1p = jnp.broadcast_to(c1[:, None], (n, k, 4, 2))
    c2p = jnp.broadcast_to(c2[None, :], (n, k, 4, 2))
    inter = _quad_intersection_area(c1p, c2p)
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
