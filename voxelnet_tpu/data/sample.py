"""Vendored sample LiDAR frames — reference-mount independence.

The reference ships a full KITTI raw drive in-repo
(/root/reference/data/2011_09_26/, SURVEY.md §2 #29); this build keeps
three representative velodyne frames of that drive vendored as
compressed, 5 mm-quantized archives (~0.55 MB each vs 1.9 MB raw) so
`bench.py` and the demo/CLI tools run with a REALISTIC point
distribution on machines without the reference checkout. Quantization
(xyz at 5 mm, reflectance at 1/255) is irrelevant for benchmarking and
demos; anything numerics-critical (golden tests, A/B parity) reads the
raw drive when mounted.

KITTI raw data citation: Geiger et al., "Vision meets Robotics: The
KITTI Dataset", IJRR 2013 (drive 2011_09_26_drive_0001, frames 0/40/80).
"""

from __future__ import annotations

import glob
import os

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "sample_frames")


def sample_frames() -> list[np.ndarray]:
    """-> list of (N, 4) float32 (x, y, z, reflectance) clouds."""
    frames = []
    for f in sorted(glob.glob(os.path.join(_DIR, "frame_*.npz"))):
        with np.load(f) as z:
            pts = np.empty((len(z["refl_u8"]), 4), np.float32)
            pts[:, :3] = z["xyz_q5mm"].astype(np.float32) * 0.005
            pts[:, 3] = z["refl_u8"].astype(np.float32) / 255.0
        frames.append(pts)
    return frames
