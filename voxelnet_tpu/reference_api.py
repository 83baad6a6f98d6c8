"""Reference-named convenience API.

Users of the PyTorch reference can find every public symbol they know under
its familiar name here, mapped onto the TPU-native implementations. The
native API (voxelnet_tpu.ops / models / training) is preferred for new
code; this module exists so switching costs one import:

    from voxelnet_tpu import reference_api as voxelnet

| reference symbol (location)                         | backed by |
|------------------------------------------------------|-----------|
| get_cfg_defaults (config.py:125)                      | config.get_config |
| pcl_to_voxels (utils.py:10)                           | ops.voxelize.voxelize_np |
| generate_anchors (utils.py:104)                       | ops.anchors.generate_anchors |
| generate_targets (utils.py:376)                       | ops.targets (vectorized, on host here) |
| deltas_to_boxes_3d (utils.py:476)                     | ops.box_coding.decode_deltas |
| nms (utils.py:492)                                    | ops.nms.nms_bev |
| smooth_L1_loss (loss.py:3)                            | ops.losses.smooth_l1 |
| label_to_gt_box_3d (utils.py:176)                     | utils.kitti.labels_to_gt_box3d |
| box3d_to_label (utils.py:817)                         | utils.kitti.boxes_to_label_lines |
| load_calib (utils.py:556)                             | utils.kitti.load_calib |
| camera_to_lidar_box / lidar_to_camera_box             | utils.geometry |
| center_to_corner_box3d / corner_to_standup_box2d ...  | utils.geometry |
| KITTIDataset / collate_fn (dataset.py:26/70)          | data.dataset |
| RPN3D (model.py:284)                                  | models.VoxelNet + make_inference_fn |
"""

from __future__ import annotations

import numpy as np

from voxelnet_tpu.config import get_config
from voxelnet_tpu.data.dataset import KITTIDataset, collate as collate_fn  # noqa: F401
from voxelnet_tpu.models.voxelnet import (  # noqa: F401
    VoxelNet as RPN3D,
    build_model,
    init_params,
    make_inference_fn,
)
from voxelnet_tpu.ops import anchors as _anchors
from voxelnet_tpu.ops import box_coding as _box_coding
from voxelnet_tpu.ops import losses as _losses
from voxelnet_tpu.ops import nms as _nms
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_np
from voxelnet_tpu.utils.geometry import (  # noqa: F401
    camera_to_lidar_boxes as camera_to_lidar_box,
    center_to_corner_box2d as center_to_corner_box_2d,
    center_to_corner_box3d,
    corner_to_standup_box2d,
    lidar_to_camera_boxes as lidar_to_camera_box,
)
from voxelnet_tpu.utils.kitti import (  # noqa: F401
    boxes_to_label_lines as box3d_to_label,
    labels_to_gt_box3d as label_to_gt_box_3d,
    load_calib,
)


def get_cfg_defaults(class_name: str = "Car"):
    """Reference: voxelnet/config.py:125-129 (plus the class switch the
    reference bakes in at import time)."""
    return get_config(class_name)


def pcl_to_voxels(pcl: np.ndarray, target: str = "Car",
                  verbose: bool = False) -> dict:
    """Reference: voxelnet/utils.py:10-100. Same buffer names and
    semantics, ragged K (no padding)."""
    cfg = get_config(target)
    spec = VoxelGridSpec.from_object_config(cfg.object)
    vox = voxelize_np(pcl, spec, shuffle=cfg.data.shuffle_points)
    out = {
        "feature_buffer": vox.features,
        "coordinate_buffer": vox.coords,
        "number_buffer": vox.counts.astype(np.int64),
    }
    if verbose:
        for k, v in out.items():
            print(f"{k} shape: {v.shape}")
    return out


def generate_anchors(class_name: str = "Car") -> np.ndarray:
    """Reference: voxelnet/utils.py:104-130."""
    return _anchors.generate_anchors(get_config(class_name).object)


def deltas_to_boxes_3d(deltas, anchors, class_name: str = "Car"):
    """Reference: voxelnet/utils.py:476-489."""
    import jax.numpy as jnp

    cfg = get_config(class_name)
    b = deltas.shape[0]
    out = _box_coding.decode_deltas(
        jnp.asarray(deltas).reshape(b, -1, 7),
        jnp.asarray(anchors).reshape(-1, 7), cfg.object.anchor_h)
    return np.asarray(out)


def nms(boxes3d, scores, overlap: float = 0.1, top_k: int = 20,
        score_thresh: float = 0.0, mode: str = "rotated"):
    """Reference: voxelnet/utils.py:492-553 (score-sorted greedy NMS).

    Takes (N, 7) lidar boxes (not standup 2D like the reference — the
    rotated-BEV IoU runs on device). Returns (kept_boxes, kept_scores).
    """
    import jax.numpy as jnp

    res = _nms.nms_bev(
        jnp.asarray(boxes3d, jnp.float32), jnp.asarray(scores, jnp.float32),
        score_thresh=score_thresh, iou_thresh=overlap,
        pre_topk=min(512, len(scores)), post_topk=top_k, mode=mode)
    valid = np.asarray(res.valid)
    return np.asarray(res.boxes)[valid], np.asarray(res.scores)[valid]


def smooth_L1_loss(deltas, targets, sigma: float = 3.0):
    """Reference: voxelnet/loss.py:3-12 (corrected gating; the reference's
    formula bug is available via ops.losses.smooth_l1(buggy=True))."""
    import jax.numpy as jnp

    return np.asarray(_losses.smooth_l1(
        jnp.asarray(deltas), jnp.asarray(targets), sigma=sigma))


def generate_targets(labels, feature_map_shape, anchors,
                     cls_name: str = "Car", coordinate: str = "lidar"):
    """Reference: voxelnet/utils.py:376-473.

    Same signature shape: per-batch label-line lists -> pos_equal_one /
    neg_equal_one (B, H', W', 2) and targets (B, H', W', 14), computed with
    the vectorized on-device assignment (corrected anchor standup geometry).
    """
    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.ops import targets as _targets
    from voxelnet_tpu.utils import kitti

    cfg = get_config(cls_name)
    obj = cfg.object
    flat = jnp.asarray(np.asarray(anchors, np.float32).reshape(-1, 7))
    standup = jnp.asarray(_targets.anchor_standup_np(obj))

    gt_list = kitti.labels_to_gt_box3d(labels, cls_name, coordinate)
    pos_out, neg_out, tgt_out = [], [], []
    for gt in gt_list:
        boxes, mask = kitti.pad_gt_boxes(gt, max(len(gt), 1))
        assign = _targets.assign_targets(
            jnp.asarray(boxes), jnp.asarray(mask), flat, standup,
            pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
            anchor_h=obj.anchor_h)
        pos, neg, tgt = _targets.targets_to_maps(
            assign, tuple(feature_map_shape))
        pos_out.append(np.asarray(pos))
        neg_out.append(np.asarray(neg))
        tgt_out.append(np.asarray(tgt))
    return np.stack(pos_out), np.stack(neg_out), np.stack(tgt_out)
