"""Sparse voxel features -> dense (B, D, H, W, C) grid.

Replaces the reference's `torch.sparse.FloatTensor(...).to_dense()`
(voxelnet/model.py:102-106) with a single XLA scatter over a static grid;
padding voxels (count == 0) are routed to an out-of-bounds index and
dropped. Voxel coords are unique per frame so `set` semantics suffice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_to_dense(voxel_features: jnp.ndarray, coords: jnp.ndarray,
                     counts: jnp.ndarray,
                     grid_dzyx: tuple[int, int, int],
                     indices_sorted: bool = False) -> jnp.ndarray:
    """(B, K, C) + (B, K, 3) zyx coords -> (B, D, H, W, C).

    `indices_sorted=True` passes the XLA scatter hints
    (indices_are_sorted + unique_indices) — measured 18.0 -> 12.4
    ms/batch8 on v5e (scripts/probe_scatter.py). Only valid when each
    frame's occupied voxels are in ascending (z*H + y)*W + x order with
    padding rows trailing — the order every framework voxelizer emits
    (ops/voxelize._sort_stage sorts by exactly this key; voxelize_np
    uses np.unique). Passing unsorted coords with the flag set silently
    corrupts the grid, so leave it False for external buffers.
    """
    D, H, W = grid_dzyx

    def one(feat, crd, cnt):
        K = feat.shape[0]
        linear = (crd[:, 0] * H + crd[:, 1]) * W + crd[:, 2]
        if indices_sorted:
            # distinct ascending out-of-bounds ids keep the trailing
            # padding rows both sorted and unique (all dropped)
            pad_ids = D * H * W + jnp.arange(K, dtype=linear.dtype)
            linear = jnp.where(cnt > 0, linear, pad_ids)
        else:
            linear = jnp.where(cnt > 0, linear, D * H * W)
        dense = jnp.zeros((D * H * W, feat.shape[-1]), feat.dtype)
        dense = dense.at[linear].set(
            feat, mode="drop", indices_are_sorted=indices_sorted,
            unique_indices=indices_sorted)
        return dense.reshape(D, H, W, feat.shape[-1])

    return jax.vmap(one)(voxel_features, coords, counts)


def scatter_to_dense_streamed(voxel_features: jnp.ndarray,
                              coords: jnp.ndarray, counts: jnp.ndarray,
                              grid_dzyx: tuple[int, int, int],
                              interpret: bool = False) -> jnp.ndarray:
    """scatter_to_dense via the Pallas streaming block-fill kernel
    (kernels/dense_build.py): every grid byte is written exactly once at
    streaming DMA sizes instead of XLA's zero-init + row scatter.

    Same voxelizer-ordered contract as `indices_sorted=True` (ascending
    (z*H + y)*W + x per frame, padding trailing). Differentiable wrt
    voxel_features. Callers pick it via
    models.voxelnet.resolve_dense_build; shape constraints
    (C % 128, K % 8, a block size dividing D*H*W) are checked there.
    """
    from voxelnet_tpu.kernels.dense_build import dense_build_pallas

    D, H, W = grid_dzyx
    n = D * H * W
    linear = ((coords[..., 0] * H + coords[..., 1]) * W
              + coords[..., 2]).astype(jnp.int32)
    ids = jnp.where(counts > 0, linear, n)
    dense = dense_build_pallas(voxel_features, ids, n, interpret)
    b, _, c = voxel_features.shape
    return dense.reshape(b, D, H, W, c)


def scatter_to_dense_gather(voxel_features: jnp.ndarray,
                            coords: jnp.ndarray, counts: jnp.ndarray,
                            grid_dzyx: tuple[int, int, int]) -> jnp.ndarray:
    """scatter_to_dense computed with ZERO scatters: searchsorted + row
    gather.

    Valid only for voxelizer-ordered buffers (each frame's occupied
    voxels in ascending (z*H + y)*W + x order, padding trailing — the
    order every framework voxelizer emits, see scatter_to_dense). For
    every grid cell, binary-search its linear id in the frame's sorted
    voxel ids (log2(K) vectorized compares over an iota — no HBM
    traffic) and gather the hit voxel's feature row, masking misses to
    zero. Gathers have no read-modify-write hazard, so XLA streams them
    where the scatter serializes row updates (~10M rows/s wall,
    scripts/probe_scatter.py). Measured on v5e: see
    scripts/probe_dense_gather.py / BASELINE.md.
    """
    D, H, W = grid_dzyx
    n_cells = D * H * W

    def one(feat, crd, cnt):
        K = feat.shape[0]
        linear = (crd[:, 0] * H + crd[:, 1]) * W + crd[:, 2]
        # padding rows -> sentinel past every cell id; real ids are
        # strictly increasing, so keys are globally non-decreasing
        keys = jnp.where(cnt > 0, linear, n_cells)
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        pos = jnp.searchsorted(keys, cells, side="left")
        pos = jnp.minimum(pos, K - 1).astype(jnp.int32)
        hit = keys[pos] == cells
        rows = feat[pos]                      # (n_cells, C) row gather
        rows = rows * hit[:, None].astype(rows.dtype)
        return rows.reshape(D, H, W, feat.shape[-1])

    return jax.vmap(one)(voxel_features, coords, counts)


def scatter_to_dense_folded(voxel_features: jnp.ndarray,
                            coords: jnp.ndarray, counts: jnp.ndarray,
                            grid_dzyx: tuple[int, int, int]) -> jnp.ndarray:
    """(B, K, C) + (B, K, 3) zyx coords -> (B, H, W, D*C), depth folded
    into channels d-major (channel = d * C + c).

    The layout MiddleLayers(backend='folded2d') consumes: the depth axis
    lives in channels from the start, so the 5D grid and its fold
    transpose never materialize.
    """
    D, H, W = grid_dzyx

    def one(feat, crd, cnt):
        C = feat.shape[-1]
        linear = (crd[:, 1] * W + crd[:, 2]) * D + crd[:, 0]
        linear = jnp.where(cnt > 0, linear, H * W * D)  # padding -> dropped
        dense = jnp.zeros((H * W * D, C), feat.dtype)
        dense = dense.at[linear].set(feat, mode="drop")
        return dense.reshape(H, W, D * C)

    return jax.vmap(one)(voxel_features, coords, counts)
