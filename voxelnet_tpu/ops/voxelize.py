"""Point-cloud voxelization with static output shapes.

The reference voxelizes per sample on the CPU with a Python dict loop
(reference: voxelnet/utils.py:10-100, `pcl_to_voxels`) and returns ragged
(K, T, 7) buffers. TPU-native redesign:

  * `voxelize_np`   — vectorized NumPy with identical semantics (host data
                      pipeline + golden tests), optional padding to a fixed
                      K bucket.
  * `voxelize_jax`  — a single jittable function over fixed (N_max, 4) point
                      buffers producing fixed (K_max, T, 7) voxel buffers:
                      sort-by-voxel-id + segmented scatter, no data-dependent
                      shapes, so the whole voxelizer lives inside the
                      inference/training graph.

Output buffers (shared layout):
  features (K, T, 7)  — x, y, z, reflectance, dx, dy, dz (offset from the
                        centroid of the *stored* points of the voxel)
  coords   (K, 3) int — (z, y, x) voxel grid indices
  counts   (K,)  int  — stored points per voxel (<= T)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_tpu.config import ObjectConfig


class VoxelGridSpec(NamedTuple):
    """Static voxelization parameters derived from an ObjectConfig."""

    grid_dzyx: tuple[int, int, int]        # (D, H, W)
    voxel_size_zyx: tuple[float, float, float]
    offset_xyz: tuple[float, float, float]  # added to points pre-binning
    max_points_per_voxel: int               # T

    @classmethod
    def from_object_config(cls, obj: ObjectConfig) -> "VoxelGridSpec":
        return cls(
            grid_dzyx=obj.grid_size,
            voxel_size_zyx=obj.voxel_size_zyx,
            offset_xyz=obj.lidar_offset,
            max_points_per_voxel=obj.points_per_voxel,
        )


class Voxels(NamedTuple):
    features: jnp.ndarray  # (K, T, 7) float32
    coords: jnp.ndarray    # (K, 3) int32, (z, y, x)
    counts: jnp.ndarray    # (K,) int32
    num_voxels: jnp.ndarray | int  # scalar: occupied voxels (<= K)
    # occupied voxels BEFORE the max_voxels clip — saturation telemetry
    # (num_voxels_raw > num_voxels means the static cap truncated the frame)
    num_voxels_raw: jnp.ndarray | int = 0


# ---------------------------------------------------------------------------
# NumPy host path (reference-parity semantics)
# ---------------------------------------------------------------------------

def in_grid_mask(points: np.ndarray, spec: VoxelGridSpec) -> np.ndarray:
    """Boolean mask of points the voxelizer would keep — the EXACT float32
    shift+divide+floor binning every voxelizer in this repo uses
    (voxelize_np below, the device path at _sort_stage, the C++ path), so
    cropping by this mask never disagrees with the binning at voxel
    boundaries.

    Used by the data pipeline's crop-to-grid step (data.crop_to_grid):
    the static max_points cap keeps the FIRST max_points of the shuffled
    cloud, so without cropping, out-of-grid points crowd out in-grid ones
    (a full 360-degree KITTI raw cloud is ~123k points of which only
    ~55-60% fall in the Car grid). The ragged reference has no cap and
    crops inside its voxelizer (voxelnet/utils.py:36-42); cropping before
    the cap keeps the capped pipeline closest to it.
    """
    D, H, W = spec.grid_dzyx
    pts = np.asarray(points, np.float32).reshape(-1, 4)
    shifted = pts[:, :3] + np.asarray(spec.offset_xyz, np.float32)
    vx = np.floor(shifted[:, 0] / spec.voxel_size_zyx[2]).astype(np.int64)
    vy = np.floor(shifted[:, 1] / spec.voxel_size_zyx[1]).astype(np.int64)
    vz = np.floor(shifted[:, 2] / spec.voxel_size_zyx[0]).astype(np.int64)
    return ((vz >= 0) & (vz < D) & (vy >= 0) & (vy < H)
            & (vx >= 0) & (vx < W))


def crop_points(points: np.ndarray, spec: VoxelGridSpec) -> np.ndarray:
    """points[in_grid_mask(points, spec)], via the native C++ fast path
    when it loads (the NumPy mask costs ~6-8 ms on a raw 123k-point
    frame — real pipeline overhead on few-core hosts)."""
    from voxelnet_tpu import native
    if native.available():
        return native.crop_in_grid(points, spec)
    pts = np.asarray(points, np.float32).reshape(-1, 4)
    return pts[in_grid_mask(pts, spec)]


def voxelize_np(points: np.ndarray, spec: VoxelGridSpec,
                max_voxels: int | None = None,
                shuffle: bool = False,
                rng: np.random.Generator | None = None) -> Voxels:
    """Vectorized host voxelizer with the reference's semantics.

    Matches voxelnet/utils.py:10-100: shift points, floor-divide into
    (z, y, x) indices, crop to grid, keep the first T points per voxel in
    arrival order, then append offsets from the per-voxel centroid of the
    stored points. `shuffle` reproduces the reference's pre-shuffle
    (voxelnet/utils.py:35); pass an rng for determinism.

    Documented deviation: when K exceeds `max_voxels` (a bucketing concept
    the ragged reference does not have), the kept subset is the lowest
    (z, y, x) grid ids — deterministic, but spatially biased toward low
    y/x. Size buckets generously for crowded scenes.
    """
    D, H, W = spec.grid_dzyx
    T = spec.max_points_per_voxel
    pts = np.asarray(points, np.float32).reshape(-1, 4)

    if shuffle:
        rng = rng or np.random.default_rng()
        pts = pts[rng.permutation(len(pts))]

    shifted = pts[:, :3] + np.asarray(spec.offset_xyz, np.float32)
    vz = np.floor(shifted[:, 2] / spec.voxel_size_zyx[0]).astype(np.int64)
    vy = np.floor(shifted[:, 1] / spec.voxel_size_zyx[1]).astype(np.int64)
    vx = np.floor(shifted[:, 0] / spec.voxel_size_zyx[2]).astype(np.int64)
    inside = (
        (vz >= 0) & (vz < D) & (vy >= 0) & (vy < H) & (vx >= 0) & (vx < W)
    )
    pts, vz, vy, vx = pts[inside], vz[inside], vy[inside], vx[inside]

    linear = (vz * H + vy) * W + vx
    uniq, inverse = np.unique(linear, return_inverse=True)
    K = len(uniq)

    # slot of each point within its voxel, preserving arrival order:
    # stable-sort by voxel, then position-in-run.
    order = np.argsort(inverse, kind="stable")
    inv_sorted = inverse[order]
    run_start = np.r_[0, np.flatnonzero(np.diff(inv_sorted)) + 1]
    starts_per_point = np.repeat(run_start, np.diff(np.r_[run_start, len(inv_sorted)]))
    slot_sorted = np.arange(len(inv_sorted)) - starts_per_point
    slot = np.empty(len(inv_sorted), np.int64)
    slot[order] = slot_sorted

    keep = slot < T
    features = np.zeros((K, T, 7), np.float32)
    features[inverse[keep], slot[keep], :4] = pts[keep]
    counts = np.minimum(np.bincount(inverse, minlength=K), T).astype(np.int32)

    # centroid offsets over the stored points (voxelnet/utils.py:86-88)
    centroid = features[:, :, :3].sum(axis=1, keepdims=True) / np.maximum(
        counts, 1).astype(np.float32).reshape(K, 1, 1)
    point_mask = (np.arange(T)[None, :] < counts[:, None])[..., None]
    features[:, :, 4:7] = (features[:, :, :3] - centroid) * point_mask

    coords = np.stack([uniq // (H * W), (uniq // W) % H, uniq % W],
                      axis=1).astype(np.int32)

    if max_voxels is not None:
        k = min(K, max_voxels)
        feat = np.zeros((max_voxels, T, 7), np.float32)
        crd = np.zeros((max_voxels, 3), np.int32)
        cnt = np.zeros((max_voxels,), np.int32)
        feat[:k], crd[:k], cnt[:k] = features[:k], coords[:k], counts[:k]
        return Voxels(feat, crd, cnt, k, K)
    return Voxels(features, coords, counts, K, K)


def resolve_host_voxelizer(configured: str = "auto"):
    """Resolve the host-pipeline voxelizer backend -> callable with the
    voxelize_np(points, spec, max_voxels) signature (no-shuffle form).

    'native' = the C++ fast path (voxelnet_tpu/native, built on demand
    with g++, ~20x voxelize_np — the NumPy twin's ~100 ms/frame caps a
    1-core host pipeline at ~10 f/s, under the device's train
    throughput); 'numpy' = the twin above; 'auto' = native when the
    library loads, else numpy.
    """
    if configured == "numpy":
        return voxelize_np
    from voxelnet_tpu import native
    if configured == "native":
        if not native.available():
            raise RuntimeError(
                "data.host_voxelizer='native' but the C++ library failed "
                "to build/load; use 'auto' or 'numpy'")
        return native.voxelize_native
    if configured == "auto":
        return native.voxelize_native if native.available() else voxelize_np
    raise ValueError(
        f"data.host_voxelizer must be auto|native|numpy, got {configured!r}")


# ---------------------------------------------------------------------------
# JAX on-device path (fixed shapes, jit-safe)
# ---------------------------------------------------------------------------

def pad_points(points: np.ndarray, max_points: int,
               rng: np.random.Generator | None = None,
               shuffle: bool = False):
    """Host-side staging: (N, 4) ragged -> ((max_points, 4), count).

    If N > max_points a uniform random subsample is taken (shuffle=True) or
    the first max_points points (shuffle=False).
    """
    pts = np.asarray(points, np.float32).reshape(-1, 4)
    if shuffle:
        rng = rng or np.random.default_rng()
        pts = pts[rng.permutation(len(pts))]
    n = min(len(pts), max_points)
    out = np.zeros((max_points, 4), np.float32)
    out[:n] = pts[:n]
    return out, np.int32(n)


# wire-format scales for train.upload_points='i16q': xyz at 5 mm,
# reflectance at 1/32768 — int16 covers ±163.8 m / ±1.0
POINT_I16_SCALES = (0.005, 0.005, 0.005, 1.0 / 32768.0)


def quantize_points_i16(points: np.ndarray) -> np.ndarray:
    """Host-side: (..., 4) f32 points -> int16 wire format (HALF the
    H2D bytes; see config.TrainConfig.upload_points)."""
    scales = np.asarray(POINT_I16_SCALES, np.float32)
    q = np.rint(np.asarray(points, np.float32) / scales)
    return np.clip(q, -32768, 32767).astype(np.int16)


def dequantize_points_i16(points: jnp.ndarray) -> jnp.ndarray:
    """In-graph: int16 wire format -> f32 points; f32 passes through.
    The dtype test is static under jit (no recompile churn)."""
    if points.dtype != jnp.int16:
        return points
    scales = jnp.asarray(POINT_I16_SCALES, jnp.float32)
    return points.astype(jnp.float32) * scales


def _cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact int32 inclusive cumsum over the last axis via triangular
    matmuls on the MXU.

    XLA lowers `jnp.cumsum` on TPU to a log-depth reduce-window chain —
    the device trace prices the (B, 65536) run-start scan at ~17 ms/batch8
    (~8% of the train step). The same scan as two f32 matmuls against
    triangular ones-matrices runs in well under 1 ms: within-chunk prefix
    sums are a (..., C, 128) @ (128, 128) upper-triangular matmul, and the
    carry across chunks is a second (strictly upper-triangular) matmul over
    the C chunk totals. Both matmuls run at Precision.HIGHEST — TPU's
    default precision truncates f32 matmul INPUTS to bf16 (7-bit
    mantissa), which would silently corrupt totals beyond ~2**8; at
    HIGHEST the f32 inputs stay exact, so the result is exact while the
    running total stays below 2**24 (here: counts of run starts <= N
    points). The precision flag costs nothing measurable at these
    (C, 128) @ (128, 128) sizes. Falls back to jnp.cumsum for shapes
    where the matmul can't pay for itself.
    """
    n = x.shape[-1]
    if n % 128 != 0 or n < 512 or n > 128 * 4096:
        return jnp.cumsum(x, axis=-1)
    c = n // 128
    hi = jax.lax.Precision.HIGHEST
    xf = x.reshape(*x.shape[:-1], c, 128).astype(jnp.float32)
    # y[..., j] = sum_{k<=j} x[..., k]  ==  x @ upper_tri(incl. diagonal)
    incl = jnp.triu(jnp.ones((128, 128), jnp.float32))
    within = jnp.matmul(xf, incl, precision=hi)
    totals = within[..., :, -1]                       # (..., C) chunk sums
    # exclusive prefix of chunk totals: strictly-upper-triangular matmul
    excl = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)
    carry = jnp.einsum("...c,cd->...d", totals, excl, precision=hi)
    out = within + carry[..., :, None]
    return out.reshape(*x.shape).astype(jnp.int32)


def _sort_stage(points, num_points, spec: VoxelGridSpec,
                max_voxels: int):
    """Per-frame stage 1: bin, validity-mask, sort by voxel id, run
    analysis. Pure vector ops — safe under vmap."""
    D, H, W = spec.grid_dzyx
    N = points.shape[0]
    INVALID = jnp.int32(D * H * W)  # sorts after all real voxels

    shifted = points[:, :3] + jnp.asarray(spec.offset_xyz, jnp.float32)
    sizes = jnp.asarray(
        (spec.voxel_size_zyx[2], spec.voxel_size_zyx[1],
         spec.voxel_size_zyx[0]), jnp.float32)
    # DIVIDE, exactly like voxelize_np (line 92-94): floor(x * (1/s))
    # rounds differently from floor(x / s) within ~1 ulp of voxel
    # boundaries, which silently broke host/device binning parity for
    # boundary-adjacent points
    vxyz = jnp.floor(shifted / sizes).astype(jnp.int32)  # (N, 3) x,y,z
    vx, vy, vz = vxyz[:, 0], vxyz[:, 1], vxyz[:, 2]

    valid = (
        (jnp.arange(N, dtype=jnp.int32) < num_points)
        & (vx >= 0) & (vx < W) & (vy >= 0) & (vy < H)
        & (vz >= 0) & (vz < D)
    )
    linear = jnp.where(valid, (vz * H + vy) * W + vx, INVALID)

    # Sort by voxel id, carrying the point payload through the sort
    # (multi-operand lax.sort) — avoids an N-row gather. Voxel coords are
    # NOT carried: every sort pass moves every payload column, and the
    # (vz, vy, vx) columns are recoverable from the sorted key by two
    # divmods (`_decode_zyx`) — dropping them cut the 9-operand sort
    # (XLA adds an iota for stability) to 6 and saved ~2 ms/batch8 on
    # v5e (BASELINE.md).
    (sort_ids, spx, spy, spz, spr) = jax.lax.sort(
        (linear, points[:, 0], points[:, 1], points[:, 2], points[:, 3]),
        num_keys=1)
    # returned as COLUMNS: each consumer stacks in its own target
    # layout (rows (N, 4) for the XLA table scatter, channel-planar
    # (4, N) for the Pallas kernels) — stacking rows here and
    # transposing later cost two ~160 MB layout copies per batch24
    # (profiles/r4/trace_infer_r4.md copy.360-362)
    sorted_cols = (spx, spy, spz, spr)
    sorted_valid = sort_ids < INVALID

    # Run starts — first point of each voxel in sorted order.
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sort_ids[:-1]])
    is_start = (sort_ids != prev) & sorted_valid
    # Compact voxel slot: cumsum over run starts (first voxel -> slot 0).
    # MXU matmul formulation — XLA's reduce-window scan is ~17 ms/batch8
    # at N=65536 (see _cumsum_i32).
    voxel_slot = _cumsum_i32(is_start.astype(jnp.int32)) - 1
    num_voxels_raw = voxel_slot[-1] + 1
    num_voxels = jnp.minimum(num_voxels_raw, max_voxels)
    return (sorted_cols, sort_ids, sorted_valid, is_start, voxel_slot,
            num_voxels, num_voxels_raw)


def _decode_zyx(linear_ids, spec: VoxelGridSpec):
    """Sorted linear voxel ids -> (..., 3) zyx bin coords (two divmods).

    Inverse of `_sort_stage`'s (vz * H + vy) * W + vx key. Only positions
    the caller knows are valid matter — the INVALID sentinel decodes to
    (D, 0, 0) and must be masked/dropped by the consumer."""
    _, H, W = spec.grid_dzyx
    vx = linear_ids % W
    rest = linear_ids // W
    return jnp.stack([rest // H, rest % H, vx], axis=-1)


def _pallas_prepare(points, num_points, spec: VoxelGridSpec,
                    max_voxels: int, layout: str = "rows"):
    """Per-frame stage 2 (Pallas path): run starts / counts / coords.

    Pure vector ops plus one small (K_max-target) scatter — safe under
    vmap; the table copy itself happens in the batched Pallas kernel.
    `layout`: 'rows' returns the sorted points as (N, 4); 'planar'
    returns channel-planar (4, N) — the layout the Pallas kernels
    consume, stacked straight from the sort columns so no transpose
    copy ever materializes.
    """
    T = spec.max_points_per_voxel
    N = points.shape[0]
    (sorted_cols, sort_ids, sorted_valid, is_start, voxel_slot,
     num_voxels, num_voxels_raw) = _sort_stage(
        points, num_points, spec, max_voxels)
    sorted_pts = jnp.stack(sorted_cols, axis=0 if layout == "planar"
                           else 1)
    idx = jnp.arange(N, dtype=jnp.int32)

    # ONE merged scatter builds run starts AND count boundaries (the
    # r03 code paid two N-row scatters here — 14.9 ms of the 218 ms
    # B24 inference graph, profiles/r4/trace_infer_r4.md — and XLA's
    # row-scatter rate, not the tiny table size, is the cost):
    # table M (max_voxels + 2,), init N; every run start writes its
    # index at its voxel slot, the FIRST overflow voxel (slot ==
    # max_voxels) closes the last kept voxel, all later rows drop.
    total_valid = sorted_valid.sum().astype(jnp.int32)
    slots = jnp.where(is_start & (voxel_slot <= max_voxels),
                      voxel_slot, max_voxels + 1)
    starts = jnp.full((max_voxels + 2,), N, jnp.int32).at[slots].set(
        idx, mode="drop")
    run_start = starts[:max_voxels]
    # counts from consecutive start differences; min(., total_valid)
    # closes the last kept run when there is NO overflow voxel (its
    # "next start" slot still holds the init N > total_valid) and
    # zeroes all padding voxels (N - N)
    closed = jnp.minimum(starts[: max_voxels + 1], total_valid)
    counts = jnp.clip(closed[1:] - closed[:-1], 0, T)

    # coords from the K run-start KEYS (two divmods) — not carried
    # through the sort; padding voxels (run_start == N) hit the zero pad
    # and decode to (0, 0, 0), same as before
    ids_padded = jnp.concatenate(
        [sort_ids, jnp.zeros((1,), jnp.int32)], axis=0)
    coords = _decode_zyx(ids_padded[jnp.minimum(run_start, N)], spec)
    return sorted_pts, run_start, counts, coords, num_voxels, num_voxels_raw


def _finalize(table, counts, coords, num_voxels, T: int,
              num_voxels_raw=0) -> Voxels:
    """Shared epilogue: zero padding rows (the Pallas run-copy leaves
    trailing garbage from the neighboring run; XLA rows are already zero)
    and build centroid offsets over the stored points. Batched or not."""
    point_mask = (
        jnp.arange(T, dtype=jnp.int32)[..., None, :, None]
        < counts[..., :, None, None]
    ).astype(jnp.float32)
    point_mask = point_mask.reshape(*counts.shape, T, 1)
    table = table * point_mask
    denom = jnp.maximum(counts, 1).astype(jnp.float32)[..., None, None]
    centroid = table[..., :3].sum(axis=-2, keepdims=True) / denom
    offsets = (table[..., :3] - centroid) * point_mask
    features = jnp.concatenate([table, offsets], axis=-1)
    return Voxels(features, coords, counts, num_voxels, num_voxels_raw)


def voxelize_planar_t(points: jnp.ndarray, num_points: jnp.ndarray,
                      spec: VoxelGridSpec, max_voxels: int,
                      interpret: bool | None = None):
    """Batched fast-table voxelizer in voxel-major ("planar-T") layout.

    (B, N, 4) + (B,) -> (tab_t (B, 4, T, K) f32 RAW, coords (B, K, 3),
    counts (B, K), num_voxels (B,), num_voxels_raw (B,)).

    The Pallas channel-planar run-copy builds the table at ~4x the XLA
    row scatter's throughput (7.6 vs 29.7 ms/batch8 on v5e,
    scripts/probe_planar.py) and transposes each 128-voxel block to
    voxel-major IN VMEM (`build_voxel_table_planar_t`), so the
    slot-stride (B, 4, K*128) intermediate never reaches HBM. Rows past
    each voxel's count carry the next run's points — the consumer
    (models.vfe_planar.planar_point_features) masks them, mirroring
    `_finalize`. interpret=None auto-selects the Pallas interpreter
    off-TPU, keyed to the devices that will execute (ambient mesh /
    default backend — parallel.execution_platform, NOT the
    process-global jax.default_backend, which can disagree with a CPU
    mesh when a TPU plugin is registered).
    """
    if interpret is None:
        from voxelnet_tpu.parallel import execution_platform

        interpret = execution_platform() != "tpu"
    from voxelnet_tpu.kernels.voxelize_pallas import (
        build_voxel_table_planar_t)

    T = spec.max_points_per_voxel
    (planar4, run_start, counts, coords, num_voxels,
     num_voxels_raw) = jax.vmap(
        lambda p, n: _pallas_prepare(p, n, spec, max_voxels,
                                     layout="planar")
    )(points, num_points)
    tab_t = build_voxel_table_planar_t(
        planar4, run_start, max_voxels, T, interpret=interpret)
    tab_t = tab_t[:, :, :T, :]
    return tab_t, coords, counts, num_voxels, num_voxels_raw


def voxelize_planar_t_sharded(points: jnp.ndarray,
                              num_points: jnp.ndarray,
                              spec: VoxelGridSpec, max_voxels: int,
                              mesh, batch_axes=("data",),
                              interpret: bool | None = None):
    """shard_map wrapper of `voxelize_planar_t` over the batch mesh axes.

    A pallas_call does not auto-partition under pjit; the table build is
    embarrassingly batch-parallel, so each ('dcn','data') shard runs it
    on its local batch rows (mirrors kernels.vfe_fused.
    voxelize_vfe_fused_sharded). Per-shard batch must be >= 1.
    interpret=None resolves from the MESH's devices.
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        from voxelnet_tpu.parallel import execution_platform

        interpret = execution_platform(mesh=mesh) != "tpu"
    bspec = P(batch_axes)

    def local(p, n):
        return voxelize_planar_t(p, n, spec, max_voxels, interpret)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(batch_axes, None, None), bspec),
        out_specs=(P(batch_axes, None, None, None),
                   P(batch_axes, None, None), P(batch_axes, None),
                   bspec, bspec),
        check_vma=False,
    )
    return f(points, num_points)


def _build_table_gather(sorted_pts: jnp.ndarray, run_start: jnp.ndarray,
                        T: int) -> jnp.ndarray:
    """(B, N, 4) sorted points + (B, K) run starts -> (B, K, T, 4) tables
    via ONE gather of K contiguous (T, 4) slices per frame.

    Points of a voxel occupy one contiguous run in the sorted stream, so
    table[k] = sorted[start_k : start_k + T] — rows past the voxel's
    count carry the NEXT run's points and are zeroed by `_finalize`'s
    mask (the same epilogue the Pallas run-copy relies on). Built to
    sidestep XLA's TPU scatter throughput wall (~10M rows/s,
    probe_scatter.py) by issuing K slices instead of N rows — but
    MEASURED SLOWER on v5e: per-voxel dynamic_slice fetches serialize
    (32.6 vs the scatter's 29.7 ms/batch8 standalone; 18.6 vs 29.7 f/s
    in the full train step, BASELINE.md). Kept as an equivalence-tested
    backend; 'auto' never selects it.
    """
    b, _, _ = sorted_pts.shape
    # zero tail: padding voxels' run_start = N, and a run starting at
    # N - 1 still reads T rows
    padded = jnp.concatenate(
        [sorted_pts, jnp.zeros((b, T, 4), jnp.float32)], axis=1)

    def frame(flat, starts):
        return jax.vmap(lambda s: jax.lax.dynamic_slice(
            flat, (s, 0), (T, 4)))(starts)

    return jax.vmap(frame)(padded, run_start)


def voxelize_jax(points: jnp.ndarray, num_points: jnp.ndarray,
                 spec: VoxelGridSpec, max_voxels: int,
                 backend: str = "xla") -> Voxels:
    """Jittable fixed-shape voxelizer (single frame).

    Args:
      points: (N_max, 4) float32 — padded (x, y, z, reflectance).
      num_points: scalar int32 — valid prefix length.
      spec: static grid parameters.
      max_voxels: K_max, static.
      backend: 'xla' — table/coords/counts built with XLA scatters;
        'gather' — table built as one gather of K contiguous (T, 4)
        run slices (`_build_table_gather`);
        'pallas' — batched Pallas DMA run-copy kernel (TPU);
        'pallas_interpret' — same kernel interpreted (tests on CPU);
        'planar' / 'planar_interpret' — channel-planar Pallas run-copy
        (points in lanes, kernels/voxelize_pallas.py
        build_voxel_table_planar) + one XLA slice/transpose.

    Returns Voxels with features (K_max, T, 7), coords (K_max, 3),
    counts (K_max,) and scalar num_voxels. Padding voxels have coords
    (0,0,0) and count 0. When K exceeds max_voxels, the lowest-(z, y, x)
    voxels are kept (deterministic; see voxelize_np docstring).

    Design: sort by linear voxel id carrying the payload (XLA multi-operand
    sort), segmented run analysis with vector ops, then either XLA scatters
    or one Pallas DMA block-copy per voxel. Everything static-shape.
    """
    T = spec.max_points_per_voxel
    if backend in ("pallas", "pallas_interpret", "gather",
                   "planar", "planar_interpret"):
        batched = voxelize_batch_jax(points[None], num_points[None],
                                     spec, max_voxels, backend)
        return Voxels(batched.features[0], batched.coords[0],
                      batched.counts[0], batched.num_voxels[0],
                      batched.num_voxels_raw[0])
    if backend != "xla":
        raise ValueError(f"unknown voxelizer backend {backend!r}")

    N = points.shape[0]
    (sorted_cols, sort_ids, sorted_valid, is_start, voxel_slot,
     num_voxels, num_voxels_raw) = _sort_stage(
        points, num_points, spec, max_voxels)
    sorted_pts = jnp.stack(sorted_cols, axis=1)
    idx = jnp.arange(N, dtype=jnp.int32)

    run_start_idx = jax.lax.cummax(jnp.where(is_start, idx, 0))
    in_voxel_slot = idx - run_start_idx
    keep = (sorted_valid & (in_voxel_slot < T)
            & (voxel_slot < max_voxels))
    flat_slot = jnp.where(keep, voxel_slot * T + in_voxel_slot,
                          max_voxels * T)  # OOB index -> dropped

    table = jnp.zeros((max_voxels * T, 4), jnp.float32)
    table = table.at[flat_slot].set(
        jnp.where(keep[:, None], sorted_pts, 0.0), mode="drop")
    table = table.reshape(max_voxels, T, 4)

    counts = jnp.zeros((max_voxels,), jnp.int32).at[
        jnp.where(keep, voxel_slot, max_voxels)
    ].add(1, mode="drop")

    coord_target = jnp.where(is_start & (voxel_slot < max_voxels),
                             voxel_slot, max_voxels)
    coords = jnp.zeros((max_voxels, 3), jnp.int32).at[coord_target].set(
        _decode_zyx(sort_ids, spec), mode="drop")
    return _finalize(table, counts, coords, num_voxels, T, num_voxels_raw)


def resolve_backend(configured: str) -> str:
    """Resolve the config's voxelizer_backend ('auto' -> 'xla').

    This selects the backend for paths that need the EXPLICIT (K, T, 7)
    point table (training, host parity checks). For those, the XLA scatter
    is the measured winner (~27 ms/batch8 on v5e; the standalone Pallas
    run-copy kernel loses to Mosaic's 4->128 lane padding + per-row DMA
    issue overhead, kernels/voxelize_pallas.py). The production INFERENCE
    path does not build the table at all: the lane-packed fused Pallas
    kernel (kernels/vfe_fused.py, selected by
    models.voxelnet.resolve_vfe_backend) goes straight from the sorted
    point stream to voxelwise VFE features at 2.5x this stage's XLA
    throughput.
    """
    if configured != "auto":
        return configured
    return "xla"


def voxelize_batch_jax(points: jnp.ndarray, num_points: jnp.ndarray,
                       spec: VoxelGridSpec, max_voxels: int,
                       backend: str = "xla") -> Voxels:
    """Batch voxelizer: (B, N_max, 4) + (B,) -> batched Voxels.

    The XLA path vmaps the per-frame function; the Pallas path vmaps the
    vector-op stages and runs the DMA table-copy kernel natively batched
    (vmapping a pallas_call produces block shapes Mosaic rejects).
    """
    if backend == "xla":
        return jax.vmap(
            lambda p, n: voxelize_jax(p, n, spec, max_voxels, backend)
        )(points, num_points)
    if backend not in ("pallas", "pallas_interpret", "gather",
                       "planar", "planar_interpret"):
        raise ValueError(f"unknown voxelizer backend {backend!r}")

    T = spec.max_points_per_voxel
    (sorted_pts, run_start, counts, coords, num_voxels,
     num_voxels_raw) = jax.vmap(
        lambda p, n: _pallas_prepare(p, n, spec, max_voxels)
    )(points, num_points)
    if backend == "gather":
        table = _build_table_gather(sorted_pts, run_start, T)
    elif backend in ("planar", "planar_interpret"):
        from voxelnet_tpu.kernels.voxelize_pallas import (
            build_voxel_table_planar)

        table = build_voxel_table_planar(
            sorted_pts, run_start, max_voxels, T,
            interpret=(backend == "planar_interpret"))
    else:
        from voxelnet_tpu.kernels.voxelize_pallas import build_voxel_table

        table = build_voxel_table(
            sorted_pts, run_start, max_voxels, T,
            interpret=(backend == "pallas_interpret"))
    return _finalize(table, counts, coords, num_voxels, T, num_voxels_raw)
