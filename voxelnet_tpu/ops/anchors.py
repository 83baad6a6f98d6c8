"""Anchor grid generation.

Same anchor layout as the reference (voxelnet/utils.py:104-130): two anchors
per feature-map cell (yaw 0 and 90 deg) with class-specific dimensions, cell
centers via inclusive linspace over the x/y range. Produced once on the host
(numpy) and treated as a constant inside the jitted graphs.
"""

from __future__ import annotations

import numpy as np

from voxelnet_tpu.config import ObjectConfig


def generate_anchors(obj: ObjectConfig) -> np.ndarray:
    """Anchors (FEATURE_HEIGHT, FEATURE_WIDTH, 2, 7) float32.

    Box layout (x, y, z, h, w, l, r); r alternates 0 / pi/2 along the last
    anchor axis. Matches voxelnet/utils.py:113-130 including the inclusive
    linspace endpoints.
    """
    x = np.linspace(obj.x_min, obj.x_max, obj.feature_width)
    y = np.linspace(obj.y_min, obj.y_max, obj.feature_height)
    cx, cy = np.meshgrid(x, y)                       # (H', W')
    cx = np.tile(cx[..., None], 2)
    cy = np.tile(cy[..., None], 2)
    cz = np.full_like(cx, obj.anchor_z)
    h = np.full_like(cx, obj.anchor_h)
    w = np.full_like(cx, obj.anchor_w)
    l = np.full_like(cx, obj.anchor_l)
    r = np.zeros_like(cx)
    r[..., 1] = np.pi / 2

    return np.stack([cx, cy, cz, h, w, l, r], axis=-1).astype(np.float32)


def anchors_flat(obj: ObjectConfig) -> np.ndarray:
    """(A, 7) flattened anchors, A = H' * W' * 2."""
    return generate_anchors(obj).reshape(-1, 7)


def anchor_diagonals(anchors_flat_arr: np.ndarray) -> np.ndarray:
    """(A,) BEV base diagonal sqrt(w^2 + l^2) used to normalize dx/dy
    (paper sec. 2.2; voxelnet/utils.py:388-390)."""
    return np.sqrt(
        anchors_flat_arr[:, 4] ** 2 + anchors_flat_arr[:, 5] ** 2
    ).astype(np.float32)
