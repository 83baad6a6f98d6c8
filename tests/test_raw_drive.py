"""Smoke tests for the raw-drive offline tools (utils/raw_drive.py —
SURVEY.md §2 rows 27-28), run against the synthetic raw drive fixture
from test_raw_to_kitti."""

import os

import numpy as np
import pytest

from tests.test_raw_to_kitti import fake_raw_drive  # noqa: F401 (fixture)
from voxelnet_tpu.utils.raw_drive import (
    RawDrive, create_clip_boxes, create_clip_pcl,
    display_frame_statistics)

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def drive_with_images(fake_raw_drive):  # noqa: F811
    sync = os.path.join(
        fake_raw_drive, "2011_09_26_drive_0001_sync")
    rng = np.random.default_rng(1)
    for cam in range(4):
        d = os.path.join(sync, f"image_{cam:02d}", "data")
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            img = rng.integers(0, 255, (48, 64, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"{i:010d}.png"), img)
    return RawDrive(os.path.dirname(fake_raw_drive), "2011_09_26", "0001")


def test_stats_figure(drive_with_images, tmp_path):
    out = display_frame_statistics(
        drive_with_images, 0, str(tmp_path / "stats.png"), points_step=16)
    assert os.path.getsize(out) > 1000


def test_clip_pcl(drive_with_images, tmp_path):
    pytest.importorskip("PIL")
    out = create_clip_pcl(drive_with_images, str(tmp_path / "clip.gif"),
                          max_frames=2, points_step=32)
    assert os.path.getsize(out) > 1000


def test_clip_boxes(drive_with_images, tmp_path):
    try:
        out = create_clip_boxes(
            drive_with_images, str(tmp_path / "boxes.avi"), max_frames=2)
    except RuntimeError as e:          # no video codec in this cv2 build
        pytest.skip(str(e))
    assert os.path.getsize(out) > 500


def test_raw_drive_loader_surface(drive_with_images):
    d = drive_with_images
    assert len(d) == 4
    assert d.velo(0).shape[1] == 4
    assert d.image(1).shape == (48, 64, 3)
    boxes, types = d.tracklets()
    # frames 0 and 1 carry the two Car tracklets from the fixture
    assert len(boxes[0]) == 2 and types[0] == ["Car", "Car"]
    assert all(c.shape == (8, 3) for c in boxes[0])
