import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops.voxelize import (
    VoxelGridSpec, pad_points, voxelize_batch_jax, voxelize_jax, voxelize_np)


@pytest.fixture(scope="module")
def car_spec():
    return VoxelGridSpec.from_object_config(get_config("Car").object)


def _cloud(n=4000, seed=0, spread=False):
    rng = np.random.default_rng(seed)
    lo, hi = ([0, -40, -3], [70.4, 40, 1]) if not spread else (
        [-120, -120, -30], [120, 120, 30])
    return np.concatenate([
        rng.uniform(lo, hi, (n, 3)),
        rng.uniform(0, 1, (n, 1)),
    ], axis=1).astype(np.float32)


def test_np_semantics_point_order_cap(car_spec):
    # three points in one voxel with T=2 keeps the first two in order
    spec = car_spec._replace(max_points_per_voxel=2)
    pts = np.array([
        [1.05, 0.05, -1.0, 0.1],
        [1.07, 0.07, -1.0, 0.2],
        [1.08, 0.08, -1.0, 0.3],
        [30.0, 10.0, 0.0, 0.4],
    ], np.float32)
    v = voxelize_np(pts, spec)
    assert v.num_voxels == 2
    counts = {tuple(c): n for c, n in zip(v.coords, v.counts)}
    assert sorted(counts.values()) == [1, 2]
    # the capped voxel stored the first two points (reflectance 0.1, 0.2)
    k = int(np.argmax(v.counts == 2))
    np.testing.assert_allclose(sorted(v.features[k, :2, 3]), [0.1, 0.2])


def test_np_centroid_offsets(car_spec):
    pts = np.array([
        [1.02, 0.02, -1.05, 0.5],
        [1.10, 0.06, -1.15, 0.5],
    ], np.float32)
    v = voxelize_np(pts, car_spec)
    assert v.num_voxels == 1
    centroid = pts[:, :3].mean(axis=0)
    np.testing.assert_allclose(
        v.features[0, :2, 4:7], pts[:, :3] - centroid, atol=1e-5)
    # padding rows are zero
    np.testing.assert_allclose(v.features[0, 2:], 0.0)


def test_np_out_of_range_dropped(car_spec):
    pts = _cloud(1000, spread=True)
    v = voxelize_np(pts, car_spec)
    D, H, W = car_spec.grid_dzyx
    assert (v.coords[:, 0] < D).all() and (v.coords[:, 0] >= 0).all()
    assert (v.coords[:, 1] < H).all()
    assert (v.coords[:, 2] < W).all()


def test_jax_matches_np(car_spec):
    pts = _cloud(6000, seed=3, spread=True)
    v_np = voxelize_np(pts, car_spec)
    padded, n = pad_points(pts, 8192)
    v_j = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 4096))(padded, n)
    kj = int(v_j.num_voxels)
    assert kj == v_np.num_voxels

    cnt_np = {tuple(c): int(x) for c, x in zip(v_np.coords, v_np.counts)}
    coords_j = np.asarray(v_j.coords)[:kj]
    counts_j = np.asarray(v_j.counts)[:kj]
    cnt_j = {tuple(c): int(x) for c, x in zip(coords_j, counts_j)}
    assert cnt_np == cnt_j

    # per-voxel point sets identical (order-insensitive)
    feats_j = np.asarray(v_j.features)[:kj]
    index_np = {tuple(c): i for i, c in enumerate(map(tuple, v_np.coords))}
    for i in range(kj):
        j = index_np[tuple(coords_j[i])]
        np.testing.assert_allclose(
            np.sort(feats_j[i], axis=0),
            np.sort(v_np.features[j], axis=0), atol=1e-4)


def test_jax_max_voxel_overflow(car_spec):
    pts = _cloud(6000, seed=4)
    padded, n = pad_points(pts, 8192)
    v = jax.jit(lambda p, n: voxelize_jax(p, n, car_spec, 64))(padded, n)
    assert int(v.num_voxels) == 64
    assert (np.asarray(v.counts) >= 0).all()
    assert int(np.asarray(v.counts)[:64].sum()) > 0


def test_jax_empty_cloud(car_spec):
    padded = np.zeros((128, 4), np.float32)
    v = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 32))(padded, np.int32(0))
    assert int(v.num_voxels) == 0
    assert int(np.asarray(v.counts).sum()) == 0


def test_batch_voxelize(car_spec):
    pts = np.stack([_cloud(2000, seed=s) for s in range(3)])
    n = np.full((3,), 2000, np.int32)
    v = jax.jit(
        lambda p, n: voxelize_batch_jax(p, n, car_spec, 2048))(pts, n)
    assert v.features.shape == (3, 2048, 35, 7)
    assert v.coords.shape == (3, 2048, 3)
    assert (np.asarray(v.num_voxels) > 0).all()


def test_no_recompile_across_counts(car_spec):
    """Static-shape contract: different point counts reuse the same trace."""
    fn = jax.jit(lambda p, n: voxelize_jax(p, n, car_spec, 1024))
    padded, _ = pad_points(_cloud(3000, 5), 4096)
    fn(padded, np.int32(1000))
    fn(padded, np.int32(3000))
    assert fn._cache_size() == 1


def test_pallas_kernel_matches_xla(car_spec):
    """The fused Pallas table-builder (interpret mode on CPU) is bit-equal
    to the XLA scatter path."""
    pts = _cloud(5000, seed=7, spread=True)
    padded, n = pad_points(pts, 8192)
    vx = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 2048, "xla"))(padded, n)
    vp = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 2048,
                                  "pallas_interpret"))(padded, n)
    assert int(vx.num_voxels) == int(vp.num_voxels)
    np.testing.assert_array_equal(np.asarray(vx.counts), np.asarray(vp.counts))
    np.testing.assert_array_equal(np.asarray(vx.coords), np.asarray(vp.coords))
    np.testing.assert_allclose(np.asarray(vx.features),
                               np.asarray(vp.features))


def test_gather_backend_matches_xla(car_spec):
    """The run-slice-gather table builder ('gather' backend — one
    dynamic_slice of (T, 4) rows per voxel off the sorted stream) is
    bit-equal to the XLA scatter path, including overflow drop."""
    for seed, kmax in ((7, 2048), (8, 64)):
        pts = _cloud(5000, seed=seed, spread=(seed == 7))
        padded, n = pad_points(pts, 8192)
        vx = jax.jit(
            lambda p, n: voxelize_jax(p, n, car_spec, kmax, "xla")
        )(padded, n)
        vg = jax.jit(
            lambda p, n: voxelize_jax(p, n, car_spec, kmax, "gather")
        )(padded, n)
        assert int(vx.num_voxels) == int(vg.num_voxels)
        np.testing.assert_array_equal(np.asarray(vx.counts),
                                      np.asarray(vg.counts))
        np.testing.assert_array_equal(np.asarray(vx.coords),
                                      np.asarray(vg.coords))
        np.testing.assert_array_equal(np.asarray(vx.features),
                                      np.asarray(vg.features))


def test_planar_kernel_matches_xla(car_spec):
    """The channel-planar run-copy table builder ('planar' backend,
    interpret mode on CPU) is bit-equal to the XLA scatter path,
    including overflow drop and non-multiple-of-block K."""
    for seed, kmax in ((7, 2048), (8, 64)):
        pts = _cloud(5000, seed=seed, spread=(seed == 7))
        padded, n = pad_points(pts, 8192)
        vx = jax.jit(
            lambda p, n: voxelize_jax(p, n, car_spec, kmax, "xla")
        )(padded, n)
        vp = jax.jit(
            lambda p, n: voxelize_jax(p, n, car_spec, kmax,
                                      "planar_interpret")
        )(padded, n)
        assert int(vx.num_voxels) == int(vp.num_voxels)
        np.testing.assert_array_equal(np.asarray(vx.counts),
                                      np.asarray(vp.counts))
        np.testing.assert_array_equal(np.asarray(vx.coords),
                                      np.asarray(vp.coords))
        np.testing.assert_array_equal(np.asarray(vx.features),
                                      np.asarray(vp.features))


def test_pallas_kernel_voxel_overflow(car_spec):
    """K > max_voxels: overflow voxels dropped identically in both paths."""
    pts = _cloud(5000, seed=8)
    padded, n = pad_points(pts, 8192)
    vx = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 64, "xla"))(padded, n)
    vp = jax.jit(
        lambda p, n: voxelize_jax(p, n, car_spec, 64,
                                  "pallas_interpret"))(padded, n)
    np.testing.assert_array_equal(np.asarray(vx.counts), np.asarray(vp.counts))
    np.testing.assert_allclose(np.asarray(vx.features),
                               np.asarray(vp.features))


def test_pallas_kernel_pedestrian_T45():
    """T=45 (Pedestrian/Cyclist preset) works — block sizes derive from T."""
    spec = VoxelGridSpec.from_object_config(
        get_config("Pedestrian").object)
    assert spec.max_points_per_voxel == 45
    pts = _cloud(3000, seed=9)
    padded, n = pad_points(pts, 4096)
    vx = jax.jit(
        lambda p, n: voxelize_jax(p, n, spec, 512, "xla"))(padded, n)
    vp = jax.jit(
        lambda p, n: voxelize_jax(p, n, spec, 512,
                                  "pallas_interpret"))(padded, n)
    np.testing.assert_array_equal(np.asarray(vx.counts), np.asarray(vp.counts))
    np.testing.assert_allclose(np.asarray(vx.features),
                               np.asarray(vp.features))


def test_boundary_binning_matches_host(car_spec):
    """floor(x / s) (host) vs floor(x * (1/s)) rounds differently within
    ~1 ulp of voxel boundaries — the device path must DIVIDE so boundary
    points land in the same voxel on both paths (regression)."""
    import numpy as np

    from voxelnet_tpu.ops.voxelize import voxelize_batch_jax, voxelize_np

    spec = car_spec
    # points sitting exactly on (and 1 ulp around) x/y voxel boundaries
    edges = np.arange(1, 40, dtype=np.float32) * np.float32(
        spec.voxel_size_zyx[2])
    xs = np.concatenate([edges, np.nextafter(edges, 0),
                         np.nextafter(edges, 100)])
    pts = np.zeros((len(xs), 4), np.float32)
    pts[:, 0] = xs
    pts[:, 1] = 0.05
    pts[:, 2] = -1.0
    pts[:, 3] = 0.5

    host = voxelize_np(pts, spec)
    dev = voxelize_batch_jax(
        jnp.asarray(pts)[None], jnp.asarray([len(pts)], jnp.int32),
        spec, 256, "xla")
    kh = int(host.num_voxels)
    kd = int(np.asarray(dev.num_voxels)[0])
    assert kh == kd
    host_set = {tuple(c) for c in host.coords[:kh]}
    dev_set = {tuple(c) for c in np.asarray(dev.coords)[0][:kd]}
    assert host_set == dev_set


def test_in_grid_mask_matches_voxelizer_selection(car_spec):
    # cropping by the mask then voxelizing is bit-identical to voxelizing
    # the full cloud (the voxelizer's internal crop IS this mask) — incl.
    # boundary-straddling points, so pipelines may crop pre-cap safely
    from voxelnet_tpu.ops.voxelize import in_grid_mask

    pts = _cloud(6000, seed=5, spread=True)
    # add exact-boundary points
    vz, vy, vx = car_spec.voxel_size_zyx
    ox, oy, oz = car_spec.offset_xyz
    edge = np.zeros((40, 4), np.float32)
    edge[:, 0] = np.arange(40, dtype=np.float32) * np.float32(vx) \
        - np.float32(ox)
    edge[:, 1] = -np.float32(oy)
    edge[:, 2] = -np.float32(oz)
    pts = np.concatenate([pts, edge])

    mask = in_grid_mask(pts, car_spec)
    a = voxelize_np(pts, car_spec, max_voxels=64)
    b = voxelize_np(pts[mask], car_spec, max_voxels=64)
    assert a.num_voxels == b.num_voxels
    assert a.num_voxels_raw == b.num_voxels_raw
    np.testing.assert_array_equal(a.coords, b.coords)
    np.testing.assert_array_equal(a.counts, b.counts)
    np.testing.assert_array_equal(a.features, b.features)


def test_matmul_cumsum_matches_xla_scan():
    """_cumsum_i32's triangular-matmul formulation is exact int32 cumsum.

    Covers the production shape ((B, 65536) run-start scan), negatives,
    and the fallback for shapes the matmul path rejects.
    """
    from voxelnet_tpu.ops.voxelize import _cumsum_i32

    rng = np.random.default_rng(7)
    for shape in [(65536,), (2, 65536), (3, 1024)]:
        x = rng.integers(-3, 4, size=shape).astype(np.int32)
        got = np.asarray(jax.jit(_cumsum_i32)(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.cumsum(x, axis=-1))
    # 0/1 run-start flags at the production size: totals stay well below
    # the 2**24 exactness bound
    flags = (rng.random((4, 65536)) < 0.3).astype(np.int32)
    got = np.asarray(jax.jit(_cumsum_i32)(jnp.asarray(flags)))
    np.testing.assert_array_equal(got, np.cumsum(flags, axis=-1))
    # non-multiple-of-128 length falls back to jnp.cumsum
    x = rng.integers(0, 5, size=(2, 1000)).astype(np.int32)
    got = np.asarray(_cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, axis=-1))
