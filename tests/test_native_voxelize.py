"""Golden tests: the C++ host voxelizer (voxelnet_tpu/native) against its
NumPy twin (ops/voxelize.voxelize_np — itself golden-tested against the
reference semantics, voxelnet/utils.py:10-100).

Contract: coords / counts / num_voxels / num_voxels_raw and the raw point
copies features[..., :4] are bit-exact; the centroid offsets
features[..., 4:7] may differ by <= 1 float32 ulp (the C++ side
accumulates the centroid in double, NumPy in float32 pairwise)."""

import numpy as np
import pytest

from voxelnet_tpu import native
from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops.voxelize import (VoxelGridSpec, resolve_host_voxelizer,
                                       voxelize_np)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native voxelizer not buildable")


@pytest.fixture(scope="module")
def spec():
    return VoxelGridSpec.from_object_config(get_config().object)


def _assert_match(a, b):
    assert a.num_voxels == b.num_voxels
    assert a.num_voxels_raw == b.num_voxels_raw
    np.testing.assert_array_equal(a.coords, b.coords)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.features[:, :, :4], b.features[:, :, :4])
    # <= ~2 float32 ulps at KITTI coordinate magnitudes (|x| up to ~80 m:
    # ulp 7.6e-6) — the centroid-sum accumulation-order difference
    np.testing.assert_allclose(a.features[:, :, 4:], b.features[:, :, 4:],
                               atol=2e-5)


def _random_cloud(rng, n=50000, with_cluster=True):
    # spans in- and out-of-grid; a dense cluster saturates T in one voxel
    pts = rng.uniform([-10, -45, -4, 0], [80, 45, 2, 1],
                      size=(n, 4)).astype(np.float32)
    if with_cluster:
        cluster = pts[:300].copy()
        cluster[:, :3] = pts[0, :3] + rng.normal(
            0, 0.05, (300, 3)).astype(np.float32)
        pts = np.concatenate([pts, cluster])
    return pts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_numpy_twin(spec, seed):
    pts = _random_cloud(np.random.default_rng(seed))
    a = voxelize_np(pts, spec, max_voxels=12288)
    b = native.voxelize_native(pts, spec, 12288)
    _assert_match(a, b)


def test_max_voxels_clip(spec):
    # force K_raw > max_voxels: the kept subset must be the lowest grid ids
    pts = _random_cloud(np.random.default_rng(3), n=80000)
    a = voxelize_np(pts, spec, max_voxels=256)
    b = native.voxelize_native(pts, spec, 256)
    assert b.num_voxels == 256 and b.num_voxels_raw > 256
    _assert_match(a, b)


def test_empty_and_all_outside(spec):
    for pts in (np.zeros((0, 4), np.float32),
                np.full((100, 4), -1000.0, np.float32)):
        b = native.voxelize_native(pts, spec, 64)
        assert b.num_voxels == 0 and b.num_voxels_raw == 0
        assert not b.features.any() and not b.counts.any()


def test_arrival_order_preserved(spec):
    # two points in one voxel, distinct reflectances: slot order = arrival
    base = np.array([10.0, 0.0, -1.0], np.float32)
    pts = np.stack([np.r_[base + 0.001, 0.25],
                    np.r_[base + 0.002, 0.75]]).astype(np.float32)
    b = native.voxelize_native(pts, spec, 8)
    assert b.num_voxels == 1 and b.counts[0] == 2
    assert b.features[0, 0, 3] == np.float32(0.25)
    assert b.features[0, 1, 3] == np.float32(0.75)


def test_boundary_binning_matches(spec):
    # points exactly on voxel boundaries: same float32-divide binning as
    # the NumPy twin (and therefore the on-device path,
    # ops/voxelize.py:172-176)
    vz, vy, vx = spec.voxel_size_zyx
    ox, oy, oz = spec.offset_xyz
    xs = np.arange(0, 60, dtype=np.float32) * np.float32(vx) - np.float32(ox)
    pts = np.zeros((len(xs), 4), np.float32)
    pts[:, 0] = xs
    pts[:, 1] = -np.float32(oy) + np.float32(vy) / 2
    pts[:, 2] = -np.float32(oz) + np.float32(vz) / 2
    a = voxelize_np(pts, spec, max_voxels=128)
    b = native.voxelize_native(pts, spec, 128)
    _assert_match(a, b)


def test_resolver():
    assert resolve_host_voxelizer("numpy") is voxelize_np
    assert resolve_host_voxelizer("native") is native.voxelize_native
    assert resolve_host_voxelizer("auto") is native.voxelize_native
    with pytest.raises(ValueError):
        resolve_host_voxelizer("cuda")


def test_dataset_uses_native_path(tmp_path):
    # host_voxelize dataset examples carry buffers identical to the twin's
    from voxelnet_tpu.config import get_config as gc
    from voxelnet_tpu.data.dataset import KITTIDataset

    rng = np.random.default_rng(7)
    pts = _random_cloud(rng, n=4000)
    for sub in ("velodyne", "label_2", "image_2"):
        (tmp_path / sub).mkdir()
    pts.astype(np.float32).tofile(tmp_path / "velodyne" / "000000.bin")
    (tmp_path / "label_2" / "000000.txt").write_text(
        "Car 0.0 0 1.5 0 0 50 50 1.5 1.6 3.9 5.0 1.0 20.0 1.6\n")

    cfg = gc(data={"shuffle_points": False, "host_voxelizer": "numpy"})
    ds_np = KITTIDataset(str(tmp_path), cfg, host_voxelize=True)
    cfg2 = gc(data={"shuffle_points": False, "host_voxelizer": "native"})
    ds_cc = KITTIDataset(str(tmp_path), cfg2, host_voxelize=True)
    a, b = ds_np[0], ds_cc[0]
    np.testing.assert_array_equal(a.voxel_coords, b.voxel_coords)
    np.testing.assert_array_equal(a.voxel_counts, b.voxel_counts)
    np.testing.assert_allclose(a.voxel_features, b.voxel_features, atol=2e-5)


def test_native_crop_matches_mask(spec):
    from voxelnet_tpu.ops.voxelize import crop_points, in_grid_mask

    pts = _random_cloud(np.random.default_rng(11), n=30000)
    ref = pts[in_grid_mask(pts, spec)]
    got = native.crop_in_grid(pts, spec)
    np.testing.assert_array_equal(ref, got)       # selection AND order
    np.testing.assert_array_equal(crop_points(pts, spec), ref)
    # empty in, empty out
    assert native.crop_in_grid(np.zeros((0, 4), np.float32), spec).shape \
        == (0, 4)
