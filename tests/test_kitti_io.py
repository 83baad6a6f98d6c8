import numpy as np
import pytest

from voxelnet_tpu.utils import kitti

SAMPLE_LABELS = [
    "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
    "-0.65 1.71 46.70 -1.59\n",
    "Van 0.00 2 -1.63 518.45 173.34 544.97 224.03 2.40 1.98 6.40 "
    "-4.08 1.79 23.18 -1.80\n",
    "Pedestrian 0.00 1 0.85 700.00 150.00 720.00 220.00 1.80 0.60 0.90 "
    "2.00 1.50 15.00 0.80\n",
    "DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 "
    "-1000 -1000 -10\n",
]


def test_parse_label_lines_car_accepts_van():
    boxes = kitti.parse_label_lines(SAMPLE_LABELS, "Car", "camera")
    assert boxes.shape == (2, 7)
    # layout (x, y, z, h, w, l, r) from KITTI's (h, w, l, x, y, z, ry)
    np.testing.assert_allclose(boxes[0], [-0.65, 1.71, 46.70, 1.65, 1.67,
                                          3.64, -1.59], atol=1e-5)


def test_parse_label_lines_pedestrian():
    boxes = kitti.parse_label_lines(SAMPLE_LABELS, "Pedestrian", "camera")
    assert boxes.shape == (1, 7)


def test_parse_label_lines_lidar_roundtrip():
    cam = kitti.parse_label_lines(SAMPLE_LABELS, "Car", "camera")
    lidar = kitti.parse_label_lines(SAMPLE_LABELS, "Car", "lidar")
    from voxelnet_tpu.utils import geometry

    back = geometry.lidar_to_camera_boxes(lidar)
    np.testing.assert_allclose(back[:, :6], cam[:, :6], atol=1e-4)


def test_pad_gt_boxes():
    boxes = np.ones((3, 7), np.float32)
    out, mask = kitti.pad_gt_boxes(boxes, 8)
    assert out.shape == (8, 7) and mask.sum() == 3
    out, mask = kitti.pad_gt_boxes(np.ones((10, 7), np.float32), 8)
    assert mask.sum() == 8


def test_label_emission_roundtrip():
    lidar = kitti.parse_label_lines(SAMPLE_LABELS, "Car", "lidar")
    lines = kitti.boxes_to_label_lines(
        lidar, ["Car"] * len(lidar), scores=[0.9, 0.8], coordinate="lidar")
    assert len(lines) == 2
    assert lines[0].startswith("Car ")
    assert len(lines[0].split()) == 16  # 15 fields + score
    reparsed = kitti.parse_label_lines(lines, "Car", "lidar")
    np.testing.assert_allclose(reparsed[:, :6], lidar[:, :6], atol=1e-3)


def test_load_calib(tmp_path):
    calib = tmp_path / "000000.txt"
    p_row = " ".join(str(float(i)) for i in range(12))
    calib.write_text(
        f"P0: {p_row}\nP1: {p_row}\nP2: {p_row}\nP3: {p_row}\n"
        f"R0_rect: 1 0 0 0 1 0 0 0 1\n"
        f"Tr_velo_to_cam: {p_row}\n"
        f"Tr_imu_to_velo: {p_row}\n")
    P, Tr, R = kitti.load_calib(str(calib))
    assert P.shape == (4, 4) and Tr.shape == (4, 4) and R.shape == (4, 4)
    np.testing.assert_allclose(R[:3, :3], np.eye(3))
    np.testing.assert_allclose(Tr[3], [0, 0, 0, 1])
