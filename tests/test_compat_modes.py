"""Tests for the two round-3 reference-compat modes:

  * rpn.block1_stride — instantiates the reference's non-Car RPN topology
    (stride-1 first block, voxelnet/model.py:221-227; a latent shape bug
    the presets here avoid, SURVEY.md §2).
  * compat.raster_collision — reproduces the reference's cv2-raster BEV
    collision IoU (voxelnet/dataset.py:222-240) in the augmentation path.
"""

import numpy as np
import pytest

from voxelnet_tpu.config import get_config
from voxelnet_tpu.data import augment


def _yaml_cfg(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return get_config("Car").merge_from_file(str(p))


# ---- rpn.block1_stride ---------------------------------------------------

def test_block1_stride_yaml_roundtrip(tmp_path):
    cfg = _yaml_cfg(tmp_path, "rpn: {block1_stride: 1}\n")
    assert cfg.rpn.block1_stride == 1
    # dump -> reload preserves it
    dumped = tmp_path / "snap.yaml"
    dumped.write_text(cfg.dump_yaml())
    cfg2 = get_config("Car").merge_from_file(str(dumped))
    assert cfg2.rpn.block1_stride == 1


def test_block1_stride_reaches_model():
    from voxelnet_tpu.models.voxelnet import build_model

    cfg = get_config("Pedestrian", rpn={"block1_stride": 1})
    assert build_model(cfg).rpn_block1_stride == 1
    assert build_model(get_config("Pedestrian")).rpn_block1_stride == 2


def test_block1_stride1_topology_output_is_full_res():
    """Stride-1 block1 (the reference's Ped/Cyclist build) emits maps at
    the FULL BEV resolution — 2x the anchor grid, the documented latent
    shape bug; the knob must instantiate exactly that topology."""
    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.models.rpn import RPN

    bev = jnp.zeros((1, 8, 8, 128), jnp.float32)
    for stride, hw in ((2, 4), (1, 8)):
        rpn = RPN(block1_stride=stride, dtype=jnp.float32)
        variables = rpn.init(jax.random.key(0), bev)
        cls_logits, reg = rpn.apply(variables, bev)
        assert cls_logits.shape == (1, hw, hw, 2)
        assert reg.shape == (1, hw, hw, 14)


# ---- compat.raster_collision ---------------------------------------------

def test_raster_collision_yaml_roundtrip(tmp_path):
    cfg = _yaml_cfg(tmp_path, "compat: {raster_collision: true}\n")
    assert cfg.compat.raster_collision is True
    dumped = tmp_path / "snap.yaml"
    dumped.write_text(cfg.dump_yaml())
    assert get_config("Car").merge_from_file(
        str(dumped)).compat.raster_collision is True


def _box(x, y, w=1.6, l=3.9, r=0.0):
    return np.array([x, y, w, l, r], np.float32)


def test_raster_iou_reference_quirks():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    obj = get_config("Car").object

    # identical boxes: reference's `indiv == 0` early-out returns 0.0
    # (exact IoU would be 1.0) — the quirk that makes raster mode distinct
    assert augment.raster_iou_2d(_box(20, 0), _box(20, 0), obj) == 0.0
    # disjoint boxes
    assert augment.raster_iou_2d(_box(10, -10), _box(40, 10), obj) == 0.0
    # half-overlapping axis-aligned boxes: raster IoU tracks the exact
    # value up to pixel quantization (0.2 m cells)
    exact = augment.rotated_iou_2d(_box(20, 0), _box(20, 0.8))
    raster = augment.raster_iou_2d(_box(20, 0), _box(20, 0.8), obj)
    assert raster > 0
    assert abs(raster - exact) < 0.1
    # boxes clipped off the grid (x < x_min) collapse to a degenerate
    # raster; must not crash and reports no overlap vs an in-grid box
    assert augment.raster_iou_2d(_box(-30, 0), _box(20, 0), obj) == 0.0


def test_raster_collision_flag_drives_augmentation(tmp_path):
    """With the flag on, the per-box branch must run the raster check
    end-to-end through KITTIDataset (no crash, valid example out)."""
    pytest.importorskip("cv2")
    from voxelnet_tpu.data.dataset import KITTIDataset
    from voxelnet_tpu.utils import kitti

    cfg = get_config(
        "Car",
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        data={"max_points": 2048, "max_voxels": 256, "max_gt_boxes": 8},
        compat={"raster_collision": True},
    )
    root = tmp_path / "training"
    for sub in ("velodyne", "label_2", "image_2"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    pts = rng.uniform([0, -6, -2, 0], [12.5, 6, 0.5, 1],
                      size=(1500, 4)).astype(np.float32)
    pts.tofile(root / "velodyne" / "000000.bin")
    # two nearby cars in camera coords so the collision loop has work
    lines = []
    for x, y in ((3.0, 1.5), (-1.0, 1.5)):
        lines.append(
            kitti.boxes_to_label_lines(
                np.array([[x, y, 8.0, 1.5, 1.6, 3.9, 0.2]], np.float32),
                ["Car"], coordinate="camera")[0])
    (root / "label_2" / "000000.txt").write_text("".join(lines))

    ds = KITTIDataset(str(root), cfg, augment=True, seed=3)
    hit_perbox = False
    for epoch in range(12):   # scan epochs until the per-box branch fires
        ds.set_epoch(epoch)
        ex = ds[0]
        assert ex.points.shape == (2048, 4)
        if "aug_1" in ex.tag:
            hit_perbox = True
            break
    assert hit_perbox, "per-box augmentation branch never sampled"
