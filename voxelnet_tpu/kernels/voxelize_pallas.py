"""Pallas TPU kernel: sorted point stream -> voxel point-table.

The voxelizer's hot op is distributing N sorted points into the
(K_max, T, 4) voxel point-table. XLA lowers that as a row-by-row scatter
through HBM (~12 ms for 4x65k points on v5e). Exploiting that the points
are already *sorted by voxel*, each voxel's points occupy one contiguous
run, so the kernel moves one T-row block per voxel — K_max aligned vector
copies instead of N scalar scatters.

Mosaic alignment rules shape the implementation: dynamic sublane offsets
must be 8-aligned and the lane dim must be whole, so each run is fetched as
an 8-aligned window, rotated into place with `pltpu.roll` (dynamic
shift), and stored to an 8-aligned destination (T padded up to the 8-row tile; the
caller slices back to T). Rows beyond a voxel's count carry neighboring-run
garbage and are zeroed by the vectorized epilogue in `voxelize_jax`.

Per-voxel run starts come from one cheap int32 scatter on the XLA side;
counts and coords fall out of start-index differences and a small gather —
no (N)-sized scatters remain anywhere in the voxelizer.

STATUS: equivalence-validated (interpret mode, tests) and compiles on TPU,
but not the default for table-building — Mosaic pads the 4-wide lane dim
to 128, inflating the VMEM table window 32x (e.g. 503 MB for the Car
config at batch 4), so the XLA scatter path wins when the explicit table
is required (training). The lane-packed (channel-planar, 128-wide) layout
this docstring predicted landed in `kernels/vfe_fused.py`, which skips
the HBM table entirely (sorted stream -> voxelwise VFE features) and is
the production inference path at 2.5x the XLA stage throughput.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tpad(T: int) -> int:
    """Table rows per voxel, rounded up to the 8-row sublane tile."""
    return -(-T // 8) * 8


def _win(T: int) -> int:
    """Aligned fetch window: 8-align slack (up to 7 rows) + TPAD."""
    return _tpad(T) + 8


def _kernel(pts_ref, start_ref, table_ref):
    """Copy each voxel's contiguous point run into its table block.

    Per grid step (one frame):
    pts_ref:   (1, N + WIN, 4) f32 — points sorted by voxel id, zero-padded
               so the last window read stays in bounds.
    start_ref: (1, 1, K) i32 in SMEM — index of each voxel's first point in
               sorted order; padding voxels point at the zero tail (scalar
               loads with dynamic offsets must come from SMEM).
    table_ref: (1, K * TPAD, 4) f32 output.
    """
    kmax = start_ref.shape[2]
    tpad = table_ref.shape[1] // kmax
    win = tpad + 8

    def body(k, _):
        s = start_ref[0, 0, k]
        sa = pl.multiple_of((s // 8) * 8, 8)
        window = pts_ref[0, pl.ds(sa, win), :]        # (win, 4) aligned
        rolled = pltpu.roll(window, sa - s, 0)        # row 0 = point s
        dst = pl.multiple_of(k * tpad, 8)
        table_ref[0, pl.ds(dst, tpad), :] = rolled[:tpad]
        return 0

    jax.lax.fori_loop(0, kmax, body, 0)


# per-voxel lane stride of the planar kernel; one 128-lane tile
_VSTRIDE = 128


def _planar_kernel(pts_ref, start_ref, out_ref):
    """Channel-planar run-copy: one (frame, voxel-block) step.

    pts_ref:   (1, 4, NPAD) f32 — rows x,y,z,refl; points in lanes,
               sorted by voxel id, zero lane tail so the last aligned
               window read stays in bounds.
    start_ref: (1, 1, V) i32 SMEM — per-voxel first-point index
               (padding voxels point at the zero tail, so copying them
               unconditionally plants zeros).
    out_ref:   (1, 4, V * _VSTRIDE) f32 — lanes = voxel * 128 + slot.
    """
    V = start_ref.shape[2]
    unroll = next(u for u in (8, 4, 2, 1) if V % u == 0)

    def copy_run(v):
        s = start_ref[0, 0, v]
        sa = pl.multiple_of((s // _VSTRIDE) * _VSTRIDE, _VSTRIDE)
        window = pts_ref[0, :, pl.ds(sa, 2 * _VSTRIDE)]     # (4, 256)
        rolled = pltpu.roll(window, sa - s, 1)              # lane 0 = pt s
        dst = pl.multiple_of(v * _VSTRIDE, _VSTRIDE)
        out_ref[0, :, pl.ds(dst, _VSTRIDE)] = rolled[:, :_VSTRIDE]

    def copy_u(i, _):
        base = i * unroll
        for u in range(unroll):
            copy_run(base + u)
        return 0

    jax.lax.fori_loop(0, V // unroll, copy_u, 0)


def build_voxel_table_planar(sorted_pts: jnp.ndarray,
                             run_start: jnp.ndarray,
                             max_voxels: int, T: int,
                             interpret: bool = False,
                             block_voxels: int = 128) -> jnp.ndarray:
    """(B, N, 4) sorted points + (B, K) run starts -> (B, K, T, 4) tables.

    The lane-packed fix for this file's header problem: points live in
    LANES (one 128-lane tile per voxel), channels in sublanes, so the
    per-voxel copy is a dense (4, 128) vector store instead of the
    4-wide (T, 4) rows Mosaic pads 32x. One XLA slice+transpose restores
    the (B, K, T, 4) layout the rest of the framework consumes — the
    table build itself issues K aligned window-roll copies and ZERO
    scatters. Same run-copy trick as the fused inference kernel
    (kernels/vfe_fused.py), kept as a standalone differentiable-path
    table builder for training (gradients never flow into the table, so
    autodiff through the downstream VFE is untouched).

    Rows past a voxel's count carry the next run's points and are zeroed
    by `_finalize`'s mask, exactly like the other builders.

    CAUTION (measured, BASELINE.md): the closing slice+transpose to
    (B, K, T, 4) is a layout trap inside large graphs — XLA tiles the
    (T, 4) minor dims to T(8,128), a 32x padding that added ~2.9 GB and
    OOM'd the B8 train step. The planar (B, 4, K*128) output should be
    consumed IN PLANAR SPACE (models/vfe_planar.py) for production;
    this (B, K, T, 4) entry point exists for equivalence tests and
    small graphs.
    """
    tab = build_voxel_table_planar_raw(
        sorted_pts, run_start, max_voxels, T, interpret=interpret,
        block_voxels=block_voxels)
    b = tab.shape[0]
    tab = tab.reshape(b, 4, max_voxels, _VSTRIDE)
    return tab[:, :, :, :T].transpose(0, 2, 3, 1)


def build_voxel_table_planar_raw(sorted_pts: jnp.ndarray,
                                 run_start: jnp.ndarray,
                                 max_voxels: int, T: int,
                                 interpret: bool = False,
                                 block_voxels: int = 128) -> jnp.ndarray:
    """The kernel's native (B, 4, K * 128) channel-planar output.

    Production consumers keep this in lane-dense space: reshape to
    (B, 4, K, 128) and transpose the last two dims to the voxel-major
    (B, 4, T, K) layout (minor dim K — no tile padding), then run the
    VFE there (models/vfe_planar.py). Rows past a voxel's count carry
    the next run's points — consumers must mask by counts.
    """
    if T >= _VSTRIDE:
        raise ValueError(f"points_per_voxel {T} must be < {_VSTRIDE}")
    V = min(block_voxels, max_voxels)
    if max_voxels % V:
        raise ValueError(f"max_voxels {max_voxels} % block {V} != 0")
    b, n, _ = sorted_pts.shape
    npad = n + 2 * _VSTRIDE
    planar = jnp.concatenate([
        sorted_pts.transpose(0, 2, 1),
        jnp.zeros((b, 4, npad - n), jnp.float32)], axis=2)

    return pl.pallas_call(
        _planar_kernel,
        grid=(b, max_voxels // V),
        out_shape=jax.ShapeDtypeStruct(
            (b, 4, max_voxels * _VSTRIDE), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 4, npad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, j: (i, 0, j),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, V * _VSTRIDE),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(planar, run_start[:, None, :])


def _planar_t_kernel(tpad: int):
    """Kernel factory: run-copy into VMEM scratch, then in-register
    (V, 128) -> (128, V) transposes emit the block voxel-major."""

    def kernel(pts_ref, start_ref, out_ref, scratch_ref):
        """One (frame, voxel-block) step.

        pts_ref:     (1, 4, NPAD) f32 — channel-planar sorted points.
        start_ref:   (1, 1, V) i32 SMEM — per-voxel first-point index.
        out_ref:     (1, 4, TPAD, V) f32 — voxel-major output block.
        scratch_ref: (4, V * 128) f32 VMEM — slot-major staging.
        """
        V = start_ref.shape[2]
        unroll = next(u for u in (8, 4, 2, 1) if V % u == 0)

        def copy_run(v):
            s = start_ref[0, 0, v]
            sa = pl.multiple_of((s // _VSTRIDE) * _VSTRIDE, _VSTRIDE)
            window = pts_ref[0, :, pl.ds(sa, 2 * _VSTRIDE)]
            rolled = pltpu.roll(window, sa - s, 1)
            dst = pl.multiple_of(v * _VSTRIDE, _VSTRIDE)
            scratch_ref[:, pl.ds(dst, _VSTRIDE)] = rolled[:, :_VSTRIDE]

        def copy_u(i, _):
            base = i * unroll
            for u in range(unroll):
                copy_run(base + u)
            return 0

        jax.lax.fori_loop(0, V // unroll, copy_u, 0)

        # epilogue: (V*128,) lanes -> (V, 128) rows (free relayout) ->
        # transpose -> keep the first TPAD slot rows, voxels in lanes
        for c in range(4):
            x = scratch_ref[c, :].reshape(V, _VSTRIDE)
            out_ref[0, c, :, :] = x.T[:tpad, :]

    return kernel


def build_voxel_table_planar_t(planar4: jnp.ndarray,
                               run_start: jnp.ndarray,
                               max_voxels: int, T: int,
                               interpret: bool = False,
                               block_voxels: int = 128) -> jnp.ndarray:
    """(B, 4, N) channel-planar sorted points + (B, K) run starts ->
    voxel-major (B, 4, TPAD, K) table, TPAD = T rounded up to the
    8-sublane tile. The planar input comes straight from the sort
    columns (ops.voxelize._pallas_prepare layout='planar') — no
    transpose copy.

    The production planar-T entry point (ops.voxelize.voxelize_planar_t):
    same run-copy as `build_voxel_table_planar_raw`, but the transpose to
    voxel-major happens per 128-voxel block in VMEM, so the
    (B, 4, K*128) slot-stride table (33.5 MB/frame for the Car config)
    never exists in HBM — the kernel writes TPAD/128 of that (3.2x less
    table bandwidth) and the external XLA transpose pass disappears.
    Rows past a voxel's count carry the next run's points — consumers
    mask by counts, exactly like the other builders.
    """
    if T >= _VSTRIDE:
        raise ValueError(f"points_per_voxel {T} must be < {_VSTRIDE}")
    V = min(block_voxels, max_voxels)
    if max_voxels % V:
        raise ValueError(f"max_voxels {max_voxels} % block {V} != 0")
    tpad = _tpad(T)
    b, _, n = planar4.shape
    npad = n + 2 * _VSTRIDE
    planar = jnp.concatenate(
        [planar4, jnp.zeros((b, 4, npad - n), jnp.float32)], axis=2)

    return pl.pallas_call(
        _planar_t_kernel(tpad),
        grid=(b, max_voxels // V),
        out_shape=jax.ShapeDtypeStruct(
            (b, 4, tpad, max_voxels), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, 4, npad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, j: (i, 0, j),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tpad, V), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, V * _VSTRIDE), jnp.float32)],
        interpret=interpret,
    )(planar, run_start[:, None, :])


def build_voxel_table(sorted_pts: jnp.ndarray, run_start: jnp.ndarray,
                      max_voxels: int, T: int,
                      interpret: bool = False) -> jnp.ndarray:
    """(B, N, 4) sorted points + (B, K) run starts -> (B, K, T, 4) tables.

    Natively batched with an explicit grid over frames (vmapping a
    pallas_call produces squeezed block dims Mosaic rejects).
    `interpret=True` runs the Pallas interpreter (CPU tests).
    """
    tpad, win = _tpad(T), _win(T)
    b, n, _ = sorted_pts.shape
    padded = jnp.concatenate(
        [sorted_pts, jnp.zeros((b, win, 4), jnp.float32)], axis=1)

    table = pl.pallas_call(
        _kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct(
            (b, max_voxels * tpad, 4), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, n + win, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max_voxels), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, max_voxels * tpad, 4),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded, run_start[:, None, :])
    return table.reshape(b, max_voxels, tpad, 4)[:, :, :T, :]
