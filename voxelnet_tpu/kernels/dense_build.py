"""Pallas TPU kernel: sorted voxel rows -> dense (B, D*H*W, C) grid.

The sparse->dense grid build is the last structural non-conv cost in
the inference graph. XLA lowers it as zero-init broadcast + row scatter
(models/scatter.py) — measured 35.4 ms/batch24 on v5e (~245 GB/s
against an ~820 GB/s HBM write peak; the output tensor is 8.6 GB, so
speed-of-light is ~10.5 ms). Gather reformulations lose outright
(searchsorted 1.6 s, row-gather 98 ms/batch8 —
scripts/probe_dense_gather.py), and per-row DMA writes would be
issue-rate-bound (~400k tiny DMAs/batch24).

This kernel instead STREAMS the output: the grid is cut into (R, C)
row-blocks (R ≈ 1600-3200, 0.4-0.8 MB — good DMA size, double-buffered
by the Pallas pipeline), and each block is materialized in VMEM — zeros
plus the occupied rows that fall inside it — then shipped to HBM once.
The occupied voxel ids are SORTED (the voxelizer's output contract, the
same precondition as data.scatter_hints), so the voxels of block j form
one contiguous slot range [block_start[j], block_start[j+1]) found by a
cheap XLA searchsorted over the BLOCK BOUNDARIES (n_blocks+1 queries,
not the 1.4M-query per-cell disaster). Every byte of the grid is
written exactly once, at streaming block sizes.

Mosaic alignment rules shape the row insert: dynamic sublane offsets
must be 8-aligned, so the source row is fetched as an 8-aligned window
and masked-summed into a single row (Mosaic's dynamic_rotate rejects
bf16), and the destination is a read-modify-write of the 8-aligned row
group with an iota select — ~1k vector elements per occupied voxel.

MEASURED OUTCOME (v5e, B24, Car grid): EQUAL to the XLA scatter —
voxelize+VFE+dense stage 310.3 vs 311.1 f/s, full graph 120.7 vs
121.0 — both at the same ~245 GB/s effective-write wall, i.e. the
dense build is already at its achievable floor and the remaining
inference headroom is elsewhere. Kept as an explicit, tested
alternative lowering (`data.dense_build='pallas'`);
'auto' stays on the scatter (models.voxelnet.resolve_dense_build).
Gather reformulations lose outright (searchsorted 1.6 s, row-gather
98 ms/batch8 — scripts/probe_dense_gather.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# candidate output-block row counts (multiples of 8, descending): pick
# the first that divides D*H*W. 3200 rows x 128 lanes x bf16 = 800 KB.
_BLOCK_ROWS = (3200, 2048, 1600, 1024, 800, 640, 512, 400, 256, 200,
               128, 64, 32, 16, 8)


def pick_block_rows(n_cells: int) -> int | None:
    for r in _BLOCK_ROWS:
        if n_cells % r == 0:
            return r
    return None


def _kernel(ids_ref, bs_ref, feat_ref, out_ref):
    """One (frame, block) step: zero the (R, C) block, insert its rows.

    ids_ref: (1, 1, K) i32 SMEM — sorted linear cell ids, padding = n_cells.
    bs_ref:  (1, 1, nb + 1) i32 SMEM — first voxel slot of each block.
    feat_ref: (1, K, C) VMEM — voxel feature rows (fetched once per frame).
    out_ref: (1, R, C) VMEM output block.
    """
    j = pl.program_id(1)
    rows = out_ref.shape[1]
    lo = bs_ref[0, 0, j]
    hi = bs_ref[0, 0, j + 1]
    base = j * rows
    out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

    io8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(s, _):
        r = ids_ref[0, 0, s] - base
        sa = pl.multiple_of((s // 8) * 8, 8)
        win = feat_ref[0, pl.ds(sa, 8), :]
        # row extract without a dynamic sublane rotate (Mosaic's
        # dynamic_rotate rejects bf16): mask the 8-row window to the
        # wanted row and sum — exact, since the other rows are zeros
        row = jnp.sum(jnp.where(io8 == (s - sa),
                                win.astype(jnp.float32), 0.0),
                      axis=0, keepdims=True)       # (1, C) f32
        r8 = pl.multiple_of((r // 8) * 8, 8)
        grp = out_ref[0, pl.ds(r8, 8), :]
        out_ref[0, pl.ds(r8, 8), :] = jnp.where(
            io8 == (r - r8), row.astype(out_ref.dtype), grp)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_build_pallas(feat: jnp.ndarray, ids: jnp.ndarray,
                       n_cells: int, interpret: bool = False):
    """(B, K, C) rows + (B, K) SORTED linear cell ids -> (B, n_cells, C).

    ids must be ascending per frame with padding rows carrying the
    sentinel `n_cells` (trailing) — the order every framework voxelizer
    emits. C must be a multiple of 128 (lane width), K a multiple of 8,
    and n_cells divisible by one of the candidate block sizes
    (`pick_block_rows`); callers fall back to the XLA scatter otherwise
    (models/scatter.py resolve). Differentiable wrt `feat` (the VJP is
    a K-row gather of the cotangent at `ids`).
    """
    return _forward(feat, ids, n_cells, interpret)


def _forward(feat, ids, n_cells, interpret):
    B, K, C = feat.shape
    rows = pick_block_rows(n_cells)
    if rows is None:
        raise ValueError(f"no block size divides n_cells={n_cells}")
    if C % 128 or K % 8:
        raise ValueError(f"need C % 128 == 0 and K % 8 == 0 (C={C}, K={K})")
    nb = n_cells // rows
    ids = ids.astype(jnp.int32)
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * jnp.int32(rows)
    block_start = jax.vmap(
        lambda k: jnp.searchsorted(k, bounds, side="left")
    )(ids).astype(jnp.int32)

    return pl.pallas_call(
        _kernel,
        grid=(B, nb),
        out_shape=jax.ShapeDtypeStruct((B, n_cells, C), feat.dtype),
        in_specs=[
            pl.BlockSpec((1, 1, K), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb + 1), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ids[:, None, :], block_start[:, None, :], feat)


def _fwd(feat, ids, n_cells, interpret):
    return _forward(feat, ids, n_cells, interpret), ids


def _bwd(n_cells, interpret, ids, g):
    # d/dfeat of a set-scatter is a row gather of the cotangent at the
    # target cells; padding rows (sentinel id) get zero
    safe = jnp.minimum(ids, n_cells - 1).astype(jnp.int32)
    rows = jnp.take_along_axis(g, safe[:, :, None], axis=1)
    rows = rows * (ids < n_cells)[:, :, None].astype(rows.dtype)
    return rows, None


dense_build_pallas.defvjp(_fwd, _bwd)
