"""On-device box encode / decode between anchors and regression deltas.

Decode matches the reference's `deltas_to_boxes_3d`
(voxelnet/utils.py:476-489); encode is its inverse, used by on-device target
assignment. Delta layout per anchor: (dx, dy, dz, dh, dw, dl, dr).
"""

from __future__ import annotations

import jax.numpy as jnp


def decode_deltas(deltas: jnp.ndarray, anchors: jnp.ndarray,
                  anchor_h: float, yaw_mode: str = "delta") -> jnp.ndarray:
    """Deltas -> absolute lidar boxes.

    Args:
      deltas: (..., A, 7) or (..., H', W', 14) regression output.
      anchors: (A, 7) flattened anchors.
      anchor_h: the class anchor height (z offsets are normalized by it,
        voxelnet/utils.py:485).
      yaw_mode: 'delta' (reference semantics: r = dr + anchor_r) or
        'sin' (train.yaw_encoding='sin': dr carries sin(gt_r - anchor_r),
        decoded r = anchor_r + arcsin(clip(dr)) — resolves the pi
        ambiguity of rectangles; see encode_boxes).

    Returns (..., A, 7) boxes (x, y, z, h, w, l, r).
    """
    deltas = deltas.reshape(*deltas.shape[:-3], -1, 7) \
        if deltas.shape[-1] != 7 else deltas
    anchors = anchors.astype(deltas.dtype)
    diag = jnp.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)

    xy = deltas[..., 0:2] * diag[:, None] + anchors[:, 0:2]
    z = deltas[..., 2:3] * anchor_h + anchors[:, 2:3]
    hwl = jnp.exp(deltas[..., 3:6]) * anchors[:, 3:6]
    dr = deltas[..., 6:7]
    if yaw_mode == "sin":
        dr = jnp.arcsin(jnp.clip(dr, -1.0, 1.0))
    elif yaw_mode != "delta":
        raise ValueError(f"yaw_mode={yaw_mode!r}")
    r = dr + anchors[:, 6:7]
    return jnp.concatenate([xy, z, hwl, r], axis=-1)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray,
                 anchor_h: float, yaw_mode: str = "delta") -> jnp.ndarray:
    """Absolute lidar boxes -> deltas w.r.t. anchors (inverse of decode).

    Args:
      boxes: (..., A, 7) target boxes aligned to anchors.
      anchors: (A, 7).
      yaw_mode: 'delta' (reference: dr = gt_r - anchor_r) or 'sin'
        (dr = sin(gt_r - anchor_r), the SECOND-style encoding): a BEV
        rectangle at r and r - pi is the same shape, so two visually
        identical boxes can carry raw-delta targets differing by pi and
        the regressor learns their mean (~90 deg off). sin() is
        pi-periodic up to sign and |sin| agrees for r and r - pi near
        the +-pi/2 boundary, removing the ambiguity; rotated-BEV IoU is
        pi-symmetric so AP is unaffected by the residual direction flip.
    """
    anchors = anchors.astype(boxes.dtype)
    diag = jnp.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    xy = (boxes[..., 0:2] - anchors[:, 0:2]) / diag[:, None]
    z = (boxes[..., 2:3] - anchors[:, 2:3]) / anchor_h
    hwl = jnp.log(jnp.maximum(boxes[..., 3:6], 1e-6) / anchors[:, 3:6])
    r = boxes[..., 6:7] - anchors[:, 6:7]
    if yaw_mode == "sin":
        # wrap the residual into [-pi/2, pi/2] modulo pi FIRST: sin is
        # monotone there so arcsin inverts exactly, and dtheta vs
        # dtheta - pi (the same rectangle) wrap to the SAME value.
        # sin() without the wrap flips sign for |dtheta| > pi/2 and
        # decodes a MIRRORED rectangle (measured: synthetic Car AP@0.5
        # 0.45 -> 0.22 with the unwrapped form).
        r = r - jnp.pi * jnp.round(r / jnp.pi)
        r = jnp.sin(r)
    elif yaw_mode != "delta":
        raise ValueError(f"yaw_mode={yaw_mode!r}")
    return jnp.concatenate([xy, z, hwl, r], axis=-1)
