"""Tests for the raw-drive -> KITTI-detection-format synthesizer
(voxelnet_tpu/data/raw_to_kitti.py) — the tool behind the real-data AP
A/B (BASELINE.md). Builds a tiny fake raw drive in a tmpdir and checks
the emitted labels/calib roundtrip geometrically through the same
parsers training and eval use."""

import os

import numpy as np
import pytest

from voxelnet_tpu.data.raw_to_kitti import convert_drive
from voxelnet_tpu.training.evaluate import evaluate_ap
from voxelnet_tpu.utils import kitti

# lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
_R_VELO = np.array([[0.0, -1.0, 0.0],
                    [0.0, 0.0, -1.0],
                    [1.0, 0.0, 0.0]])
_T_VELO = np.array([0.01, -0.05, -0.29])
_P2 = np.array([[700.0, 0.0, 600.0, 0.0],
                [0.0, 700.0, 180.0, 0.0],
                [0.0, 0.0, 1.0, 0.0]])

# two Car tracklets: (h, w, l), bottom-center lidar trans per frame, yaw rz
_CARS = [
    ((1.5, 1.6, 3.9), [(18.0, 2.0, -1.2), (18.5, 2.0, -1.2)], 0.3),
    ((1.4, 1.7, 4.2), [(30.0, -4.0, -1.0), (30.2, -4.1, -1.0)], -0.8),
]
_N_FRAMES = 4


def _tracklet_xml() -> str:
    items = []
    for (h, w, l), poses, rz in _CARS:
        pose_items = "".join(
            f"<item><tx>{tx}</tx><ty>{ty}</ty><tz>{tz}</tz>"
            f"<rx>0</rx><ry>0</ry><rz>{rz}</rz>"
            f"<state>2</state><occlusion>0</occlusion>"
            f"<occlusion_kf>0</occlusion_kf><truncation>0</truncation>"
            "</item>"
            for tx, ty, tz in poses)
        items.append(
            f"<item><objectType>Car</objectType>"
            f"<h>{h}</h><w>{w}</w><l>{l}</l><first_frame>0</first_frame>"
            f"<poses><count>{len(poses)}</count><item_version>2"
            f"</item_version>{pose_items}</poses><finished>1</finished>"
            "</item>")
    return ("<?xml version=\"1.0\"?><boost_serialization>"
            f"<tracklets class_id=\"0\"><count>{len(items)}</count>"
            "<item_version>1</item_version>" + "".join(items) +
            "</tracklets></boost_serialization>")


@pytest.fixture
def fake_raw_drive(tmp_path):
    date = "2011_09_26"
    root = tmp_path / date
    sync = root / f"{date}_drive_0001_sync"
    velo = sync / "velodyne_points" / "data"
    velo.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(_N_FRAMES):
        pts = rng.uniform([0, -20, -2, 0], [60, 20, 1, 1],
                          size=(512, 4)).astype(np.float32)
        pts.tofile(velo / f"{i:010d}.bin")
    (sync / "tracklet_labels.xml").write_text(_tracklet_xml())
    cam = ["P_rect_02: " + " ".join(str(v) for v in _P2.ravel()),
           "R_rect_00: " + " ".join(str(v) for v in np.eye(3).ravel())]
    (root / "calib_cam_to_cam.txt").write_text("\n".join(cam) + "\n")
    vel = ["R: " + " ".join(str(v) for v in _R_VELO.ravel()),
           "T: " + " ".join(str(v) for v in _T_VELO)]
    (root / "calib_velo_to_cam.txt").write_text("\n".join(vel) + "\n")
    return str(root)


def test_convert_counts_and_layout(fake_raw_drive, tmp_path):
    out = str(tmp_path / "det")
    counts = convert_drive(fake_raw_drive, "0001", out, val_every=4,
                           split_mode="interleave")
    assert counts["training"] == 3 and counts["validation"] == 1
    # frames 0,1 carry 2 cars each; frames 2,3 have none annotated
    assert counts["objects"] == 4
    for split, tags in (("training", ["000000", "000001", "000002"]),
                        ("validation", ["000003"])):
        for tag in tags:
            for sub, ext in (("velodyne", ".bin"), ("label_2", ".txt"),
                             ("calib", ".txt")):
                assert os.path.exists(os.path.join(out, split, sub,
                                                   tag + ext))


def test_label_roundtrip_to_lidar(fake_raw_drive, tmp_path):
    """Emitted labels, parsed back with the training-path parser, must
    reproduce the tracklet's lidar box (the A/B trains on these)."""
    out = str(tmp_path / "det")
    convert_drive(fake_raw_drive, "0001", out, val_every=4,
                  split_mode="interleave")
    calib = os.path.join(out, "training", "calib", "000000.txt")
    P, Tr, R = kitti.load_calib(calib)
    with open(os.path.join(out, "training", "label_2", "000000.txt")) as f:
        lines = f.readlines()
    assert len(lines) == 2
    gt = kitti.parse_label_lines(lines, "Car", "lidar", Tr, R)
    gt = gt[np.argsort(gt[:, 0])]            # by x: car A (18) then B (30)
    for got, ((h, w, l), poses, rz) in zip(gt, _CARS):
        tx, ty, tz = poses[0]
        np.testing.assert_allclose(got[:3], [tx, ty, tz], atol=5e-3)
        np.testing.assert_allclose(got[3:6], [h, w, l], atol=5e-3)
        # yaw survives modulo pi (angle_in_limit folds to [-pi/2, pi/2))
        dyaw = (got[6] - rz + np.pi / 2) % np.pi - np.pi / 2
        assert abs(dyaw) < 5e-3


def test_gt_as_predictions_scores_perfect_ap(fake_raw_drive, tmp_path):
    """Feeding the synthesized GT back as scored predictions through the
    evaluator must yield AP=1.0 — ties the synthesizer, label parser,
    and devkit evaluator together."""
    from voxelnet_tpu.cli.eval import load_frames_from_dirs

    out = str(tmp_path / "det")
    convert_drive(fake_raw_drive, "0001", out, val_every=2,
                  split_mode="interleave")
    gt_dir = os.path.join(out, "validation", "label_2")
    calib_dir = os.path.join(out, "validation", "calib")
    preds = tmp_path / "preds"
    preds.mkdir()
    n_objects = 0
    for tag in os.listdir(gt_dir):
        with open(os.path.join(gt_dir, tag)) as f:
            lines = [ln.rstrip("\n") + " 0.9\n" for ln in f if ln.strip()]
        n_objects += len(lines)
        (preds / tag).write_text("".join(lines))
    assert n_objects > 0
    frames = load_frames_from_dirs(str(preds), gt_dir, "Car", calib_dir)
    res = evaluate_ap(frames, iou_thresh=0.7, mode="3d", num_points=11)
    vals = [float(v) for v in res.values() if v == v]
    assert vals and max(vals) > 0.99


def test_block_split_is_contiguous_tail(fake_raw_drive, tmp_path):
    """Default split: the val frames are ONE contiguous block at the end
    of the drive (de-leaked A/B split — interleaving puts val frames
    seconds from train frames of the same scene instant)."""
    out = str(tmp_path / "det")
    counts = convert_drive(fake_raw_drive, "0001", out,
                           split_mode="block", val_frac=0.5)
    # ceil(4 * 0.5) = 2 val frames: the LAST two
    assert counts["training"] == 2 and counts["validation"] == 2
    train_tags = sorted(os.listdir(os.path.join(out, "training",
                                                "velodyne")))
    val_tags = sorted(os.listdir(os.path.join(out, "validation",
                                              "velodyne")))
    assert train_tags == ["000000.bin", "000001.bin"]
    assert val_tags == ["000002.bin", "000003.bin"]
