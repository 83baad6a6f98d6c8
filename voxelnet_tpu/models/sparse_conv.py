"""Sparse 3x3x3 convolution over the occupied-voxel table.

The middle stack's block-1 Conv3D (reference voxelnet/model.py:206-210)
consumes the dense (B, D, H, W, 128) grid, but only ~1% of its input
sites are occupied (13.9k of 1.4M on real Car frames) and unoccupied
sites are exactly zero (models/scatter.py fills zeros) — so a site whose
receptive field contains no occupied voxel outputs exactly `bias`. This
module computes the EXACT same convolution input-stationarily from the
(B, K, C) voxel table the VFE stage already produces:

    1. ONE matmul (B, K, C) @ (C, 27*Cout) — every kernel offset's
       contribution for every occupied voxel. The 27*Cout=1728-wide
       output dim fills the 128-lane MXU that the dense conv's 64
       output channels half-fill (measured: the C=64 dense conv3d runs
       at 18% MFU, BASELINE.md).
    2. 27 scatter-ADDs into a bias-filled (B, Do*H*W, Cout) buffer, one
       per kernel offset. For a fixed offset each occupied input voxel
       maps to a distinct output site (coords are unique per frame), so
       every scatter claims `unique_indices=True`; rows that miss the
       output grid (depth-stride parity, boundary) are routed to
       distinct out-of-range ids and dropped (`mode="drop"`).

Exactness vs the dense conv: one bf16 ulp (the matmul accumulates on
the MXU in f32 and rounds once to bf16 per offset term; the scatter
accumulates those terms in f32 — same data path as XLA's conv, summed
in a different order). Verified against scatter_to_dense + Conv3D in
tests/test_sparse_middle.py and on real frames by
scripts/probe_sparse_block1.py.

This also deletes the 128-channel sparse-to-dense scatter from the
graph: the dense grid the reference materializes
(voxelnet/model.py:255-262) is never built at C=128 — the first dense
tensor is block-1's (B, 5, H, W, 64) OUTPUT, 4x smaller.

Differentiable end-to-end: grad-input is a gather of the output
cotangent at the same ids (cheap — K rows, not D*H*W), grad-weight is
the transposed (B*K, C) x (B*K, 27*Cout) matmul — both MXU-shaped, so
the train step skips the dense conv's grad-input transposed-conv over
the 1.4M-site grid as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_OFFSETS = tuple((kd, ky, kx) for kd in range(3) for ky in range(3)
                 for kx in range(3))


def sparse_conv3x3(feat: jnp.ndarray, coords: jnp.ndarray,
                   counts: jnp.ndarray, kernel: jnp.ndarray,
                   bias: jnp.ndarray, grid_dzyx, stride_d: int,
                   pad_d: int, acc_dtype=jnp.float32,
                   w_window=None) -> jnp.ndarray:
    """Exact 3x3x3 / stride (stride_d, 1, 1) / pad (pad_d, 1, 1) conv of
    the zero-backed sparse voxel table.

    feat:   (B, K, C) voxelwise features (padding rows must be zero —
            the VFE stack masks them; enforced cheaply here anyway).
    coords: (B, K, 3) int (z, y, x) voxel coords, padding arbitrary.
    counts: (B, K) int, 0 marks padding rows.
    kernel: (3, 3, 3, C, Cout) float32 (flax Conv layout).
    bias:   (Cout,) float32.
    w_window: optional (x0, wloc) — compute only output columns
            [x0, x0 + wloc) of the W axis (x0 may be traced; wloc is
            static). The spatial-sharding unit: each 'model' shard
            produces its own W slab from the full (replicated) voxel
            table, so no halo exchange is needed (sparse_conv3x3_sharded).
    Returns (B, Do, H, W, Cout) in feat.dtype — (B, Do, H, wloc, Cout)
    under w_window — Do = conv output depth; bit-for-bit the sites an
    XLA Conv3D of scatter_to_dense(feat) fills, to one bf16 ulp.
    """
    D, H, W = grid_dzyx
    do = (D + 2 * pad_d - 3) // stride_d + 1
    B, K, C = feat.shape
    cout = kernel.shape[-1]
    x0, wloc = (0, W) if w_window is None else w_window

    live = counts > 0
    feat = jnp.where(live[..., None], feat, 0)
    # (C, 27*Cout), offset-major o = (kd*3 + ky)*3 + kx — matches _OFFSETS
    wmat = jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(C, 27 * cout)
    vals = (feat @ wmat.astype(feat.dtype)).astype(acc_dtype)
    vals = vals.reshape(B, K, 27, cout)

    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]

    def one(v, zz, yy, xx, lv):
        out = jnp.zeros((do * H * wloc, cout), acc_dtype)
        for o, (kd, ky, kx) in enumerate(_OFFSETS):
            num = zz + pad_d - kd
            oz = num // stride_d
            oy = yy + 1 - ky
            ox = xx + 1 - kx - x0
            ok = (lv & (num % stride_d == 0) & (oz >= 0) & (oz < do)
                  & (oy >= 0) & (oy < H) & (ox >= 0) & (ox < wloc))
            lin = (oz * H + oy) * wloc + ox
            # invalid rows -> distinct ids past the buffer: dropped, and
            # uniqueness stays claimable for the valid ones
            lin = jnp.where(ok, lin,
                            do * H * wloc + jnp.arange(K, dtype=lin.dtype))
            out = out.at[lin].add(v[:, o], mode="drop",
                                  unique_indices=True)
        return out

    out = jax.vmap(one)(vals, z, y, x, live)
    out = out + bias.astype(out.dtype)
    return out.reshape(B, do, H, wloc, cout).astype(feat.dtype)


def sparse_conv3x3_sharded(feat: jnp.ndarray, coords: jnp.ndarray,
                           counts: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, grid_dzyx, stride_d: int,
                           pad_d: int, num_model: int,
                           model_axis: str = "model") -> jnp.ndarray:
    """shard_map wrapper partitioning the OUTPUT grid's W axis over the
    'model' mesh axis.

    The voxel table is replicated along 'model', so each shard computes
    the exact output columns it owns via `w_window` — a halo-free
    formulation of the dense path's spatially-sharded Conv3D (there XLA
    inserts halo exchanges; here the shard reads the rows it needs from
    its replicated table copy). The (C -> 27*Cout) matmul is replicated
    per model shard (~7 GFLOP/frame — noise next to the dense conv it
    replaces); the scatter volume divides by num_model.

    Partial-manual: only `model_axis` is manual (`axis_names`); the
    batch ('data'/'dcn') axes stay automatic, so GSPMD shards the batch
    dim orthogonally and tiny tracing batches (e.g. init's B=1) need no
    divisibility. Uses the ambient mesh (`jax.set_mesh`), like the
    sharding constraints everywhere else in models/.
    """
    from jax.sharding import PartitionSpec as P

    W = grid_dzyx[2]
    if W % num_model:
        raise ValueError(
            f"W={W} must divide by num_model_shards={num_model} for the "
            "sparse1 spatial sharding")
    wloc = W // num_model

    def local(f, c, n, k, b):
        x0 = jax.lax.axis_index(model_axis) * wloc
        return sparse_conv3x3(f, c, n, k, b, grid_dzyx, stride_d, pad_d,
                              w_window=(x0, wloc))

    return jax.shard_map(
        local,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(None, None, None, model_axis, None),
        axis_names={model_axis},
        check_vma=False,
    )(feat, coords, counts, kernel, bias)
