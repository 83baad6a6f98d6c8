import numpy as np
import pytest

from voxelnet_tpu.utils import geometry


def test_angle_in_limit_scalar_semantics():
    # matches the reference while-loop semantics (voxelnet/utils.py:133-143)
    assert geometry.angle_in_limit(0.3) == pytest.approx(0.3)
    # pi/2 wraps to -pi/2 which the snap rule lifts back to +pi/2
    assert geometry.angle_in_limit(np.pi / 2) == pytest.approx(np.pi / 2)
    assert geometry.angle_in_limit(np.pi) == pytest.approx(0.0, abs=1e-9)
    assert geometry.angle_in_limit(-np.pi / 2) == pytest.approx(np.pi / 2)
    # snap window: within 5 degrees of -pi/2 -> +pi/2
    assert geometry.angle_in_limit(-np.pi / 2 + 0.01) == pytest.approx(np.pi / 2)
    assert geometry.angle_in_limit(
        np.array([0.3, 2.0])) == pytest.approx([0.3, 2.0 - np.pi])


def test_camera_lidar_roundtrip_points():
    pts = np.array([[10.0, 2.0, -1.0], [30.0, -5.0, 0.5]])
    cam = geometry.lidar_to_camera_points(pts)
    back = geometry.camera_to_lidar_points(cam)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_camera_lidar_roundtrip_boxes():
    boxes = np.array([[5.0, 1.0, -1.5, 1.5, 1.6, 3.9, 0.3]])
    cam = geometry.lidar_to_camera_boxes(boxes)
    back = geometry.camera_to_lidar_boxes(cam)
    np.testing.assert_allclose(back[0, :6], boxes[0, :6], atol=1e-9)
    # angle wraps into [-pi/2, pi/2)
    assert back[0, 6] == pytest.approx(0.3, abs=1e-9)


def test_center_to_corner_axis_aligned():
    # box at origin, yaw 0: length along x, width along y, z = bottom
    box = np.array([[0.0, 0.0, 0.0, 2.0, 1.0, 4.0, 0.0]])
    corners = geometry.center_to_corner_box3d(box, "lidar")
    assert corners.shape == (1, 8, 3)
    c = corners[0]
    np.testing.assert_allclose(sorted(set(np.round(c[:, 0], 6))), [-2, 2])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 1], 6))), [-0.5, 0.5])
    np.testing.assert_allclose(sorted(set(np.round(c[:, 2], 6))), [0, 2])
    # bottom face first (matches voxelnet/utils.py:316-319 template)
    np.testing.assert_allclose(c[:4, 2], 0.0)
    np.testing.assert_allclose(c[4:, 2], 2.0)


def test_center_to_corner_rotation_90deg():
    box = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 4.0, np.pi / 2]])
    c = geometry.center_to_corner_box3d(box, "lidar")[0]
    # after 90 deg the length axis lies along y
    assert np.round(np.abs(c[:, 1]).max(), 5) == 2.0
    assert np.round(np.abs(c[:, 0]).max(), 5) == 0.5


def test_corner_center_roundtrip():
    rng = np.random.default_rng(1)
    boxes = np.stack([
        rng.uniform(5, 50, 4),            # x
        rng.uniform(-10, 10, 4),          # y
        rng.uniform(-2, 0, 4),            # z
        rng.uniform(1.3, 1.8, 4),         # h
        rng.uniform(1.4, 1.8, 4),         # w
        rng.uniform(3.5, 4.5, 4),         # l
        rng.uniform(-1.2, 1.2, 4),        # r
    ], axis=1)
    corners = geometry.center_to_corner_box3d(boxes, "lidar")
    rec = geometry.corner_to_center_box3d(corners, "lidar")
    # the averaging estimator works in camera coords whose axes are only
    # approximately aligned with lidar (same ~1cm distortion as the
    # reference's estimator, voxelnet/dataset.py:305-384)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=2e-2)
    dr = geometry.angle_in_limit(rec[:, 6] - boxes[:, 6])
    np.testing.assert_allclose(dr, 0.0, atol=1e-2)


def test_standup_from_corners():
    corners = np.array([[[0, 0], [2, 0], [2, 1], [0, 1]]], np.float64)
    s = geometry.corner_to_standup_box2d(corners)
    np.testing.assert_allclose(s[0], [0, 0, 2, 1])


def test_anchor_standup_correct_vs_buggy():
    # yaw-0 anchor (even row): extent l along x, w along y
    anchors = np.array([[10.0, 0.0, 1.6, 3.9],
                        [10.0, 0.0, 1.6, 3.9]])  # second row = yaw 90
    fixed = geometry.anchor_to_standup_box2d(anchors)
    np.testing.assert_allclose(fixed[0], [10 - 1.95, -0.8, 10 + 1.95, 0.8])
    np.testing.assert_allclose(fixed[1], [10 - 0.8, -1.95, 10 + 0.8, 1.95])
    buggy = geometry.anchor_to_standup_box2d(anchors, buggy=True)
    # reference defect: zero-area boxes (voxelnet/utils.py:217-225)
    np.testing.assert_allclose(buggy[:, 2], buggy[:, 0])
    np.testing.assert_allclose(buggy[:, 3], buggy[:, 1])


def test_point_transform_translation_then_rotation():
    pts = np.array([[1.0, 0.0, 0.0]])
    # translate +1x then rotate: reference composition rotates by -rz
    out = geometry.point_transform(pts, tx=1.0, rz=np.pi / 2)
    np.testing.assert_allclose(out[0], [0.0, -2.0, 0.0], atol=1e-6)


def test_box_transform_yaw_shift():
    box = np.array([[10.0, 0.0, -1.0, 1.5, 1.6, 3.9, 0.2]])
    out = geometry.box_transform(box, 0, 0, 0, rz=0.3, coordinate="lidar")
    # point_transform rotates by -rz, so yaw decreases by rz
    assert out[0, 6] == pytest.approx(-0.1, abs=1e-3)
    np.testing.assert_allclose(out[0, 3:6], box[0, 3:6], atol=1e-3)


def test_projection_shapes():
    boxes = np.array([[15.0, 0.0, -1.0, 1.5, 1.6, 3.9, 0.0]])
    proj = geometry.lidar_box3d_to_camera_box(boxes, cal_projection=True)
    assert proj.shape == (1, 8, 2)
    box2d = geometry.lidar_box3d_to_camera_box(boxes, cal_projection=False)
    assert box2d.shape == (1, 4)
    assert box2d[0, 2] > box2d[0, 0] and box2d[0, 3] > box2d[0, 1]
