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

import functools

import jax
import jax.numpy as jnp
import numpy as np

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


def _conv3x3_dense(feat, coords, counts, kernel, bias, grid_dzyx,
                   stride_d, pad_d, indices_sorted):
    """Forward of the hybrid lowering: the measured-fastest dense path —
    scatter_to_dense + XLA Conv3D, exactly what the 'conv3d' backend
    runs (models/middle.py ConvBlock3D + models/scatter.py)."""
    from voxelnet_tpu.models.scatter import scatter_to_dense

    dense = scatter_to_dense(feat, coords, counts, grid_dzyx,
                             indices_sorted=indices_sorted)
    out = jax.lax.conv_general_dilated(
        dense, kernel.astype(feat.dtype),
        window_strides=(stride_d, 1, 1),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def conv3x3_sparsebwd(feat, coords, counts, kernel, bias, grid_dzyx,
                      stride_d, pad_d, indices_sorted=False):
    """Dense-forward / sparse-backward 3x3x3 conv of the voxel table.

    Forward = the production dense path (scatter + XLA Conv3D — measured
    fastest of every lowering tried, BASELINE.md MFU ladder). Backward
    exploits that the conv INPUT is nonzero only at the K occupied
    voxels: instead of the dense grad-input transposed-conv over the
    D*H*W grid (25.6 ms/batch8 on v5e) + dense grad-weight correlation
    (28.4 ms), it gathers the output cotangent at each voxel's 27
    neighbor sites — 9 gathers of K contiguous (3, Cout) slices on a
    zero-padded buffer (slice gathers sidestep XLA's ~10M rows/s TPU
    scatter/row-op wall, scripts/probe_gather.py) — and contracts on
    the MXU:

        dfeat = G (B,K,27*Cout) @ W^T          (27*Cout -> Cin)
        dW    = feat^T (Cin, B*K) @ G          (one MXU matmul)
        dbias = sum(dout)

    Same math as the dense VJP (different summation order; bf16 gathers,
    f32 accumulation — tested against the dense path's autodiff grads in
    tests/test_sparse_middle.py).
    """
    return _conv3x3_dense(feat, coords, counts, kernel, bias, grid_dzyx,
                          stride_d, pad_d, indices_sorted)


def _sparsebwd_fwd(feat, coords, counts, kernel, bias, grid_dzyx,
                   stride_d, pad_d, indices_sorted):
    out = _conv3x3_dense(feat, coords, counts, kernel, bias, grid_dzyx,
                         stride_d, pad_d, indices_sorted)
    return out, (feat, coords, counts, kernel)


def _sparsebwd_bwd(grid_dzyx, stride_d, pad_d, indices_sorted, res, dout):
    feat, coords, counts, kernel = res
    D, H, W = grid_dzyx
    B, K, cin = feat.shape
    do = (D + 2 * pad_d - 3) // stride_d + 1
    cout = kernel.shape[-1]

    live = counts > 0
    feat = jnp.where(live[..., None], feat, 0)

    # zero-halo the cotangent so every (oz, oy, ox-1..ox+1) window lands
    # in bounds; slab 0 along depth doubles as the dump for rows whose
    # depth-stride parity says the tap doesn't reach (reads zeros)
    dpad = jnp.pad(dout, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    flat = dpad.reshape(B, (do + 2) * (H + 2) * (W + 2), cout)

    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    slices = []
    for kd in range(3):
        num = z + pad_d - kd
        # parity-invalid taps and out-of-range depths dump into the
        # all-zero pad slabs (0 and do+1)
        oz_pad = jnp.clip(jnp.where((num % stride_d == 0) & live,
                                    num // stride_d + 1, 0), 0, do + 1)
        for ky in range(3):
            oy_pad = y + 2 - ky
            base = (oz_pad * (H + 2) + oy_pad) * (W + 2) + x
            base = jnp.where(live, base, 0)

            def frame(f, b_):
                return jax.vmap(lambda s: jax.lax.dynamic_slice(
                    f, (s, 0), (3, cout)))(b_)

            slices.append(jax.vmap(frame)(flat, base))
    # (B, K, 9, 3, Cout); slice lane j covers ox = x-1+j = x+1-kx, so
    # j = 2-kx -> flip to kx-ascending to match the o = (kd*3+ky)*3+kx
    # order of the flattened weight matrix
    g = jnp.stack(slices, axis=2)[:, :, :, ::-1, :]
    g = g.reshape(B, K, 27 * cout)

    wmat = jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(cin, 27 * cout)
    dfeat = jax.lax.dot_general(
        g, wmat.astype(g.dtype),
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dfeat = (dfeat * live[..., None]).astype(feat.dtype)

    dw = jax.lax.dot_general(
        feat.reshape(B * K, cin), g.reshape(B * K, 27 * cout),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (Cin, 27*Cout)
    dw = dw.reshape(cin, 3, 3, 3, cout).transpose(1, 2, 3, 0, 4)
    dbias = dout.astype(jnp.float32).sum(axis=(0, 1, 2, 3))

    f0 = jax.dtypes.float0
    return (dfeat,
            np.zeros(coords.shape, f0), np.zeros(counts.shape, f0),
            dw.astype(kernel.dtype), dbias)


conv3x3_sparsebwd.defvjp(_sparsebwd_fwd, _sparsebwd_bwd)


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
