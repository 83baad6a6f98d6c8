"""Fused Pallas TPU kernel: sorted point stream -> voxelwise VFE features.

The north-star fusion (BASELINE.json): voxel table build + the entire VFE
stack in ONE kernel. The XLA path materializes the (B, K, T, 7) point
table in HBM with a row-by-row scatter (~27 ms of the 33 ms
voxelize+VFE stage at batch 8 on v5e), then reads it back through two
Dense/BN/max layers. Here the table never exists in HBM:

  per (frame, voxel-block) grid step
    1. each voxel's contiguous point run (the stream is sorted by voxel
       id) is copied VMEM->VMEM into a block table with an 8-aligned
       window + `pltpu.roll` (same extraction the standalone voxelize
       kernel uses, but into scratch instead of HBM),
    2. centroid offsets (reference semantics voxelnet/utils.py:86-88),
    3. VFE1 -> VFE2 (Dense -> ReLU -> BN affine -> masked max -> concat,
       voxelnet/model.py:60-108) on (V, TPAD, C) blocks — MXU matmuls,
       VPU masked reductions — all VMEM-resident,
    4. only the (V, 128) voxelwise output row leaves the chip.

Inference-mode only: BatchNorm folds into per-channel scale/shift from
running statistics (training keeps the XLA path — batch statistics need a
global reduction anyway). Equivalence-tested against the flax
FeatureLearningNet in interpret mode (tests/test_vfe_fused.py) and on TPU
by bench.py --stage vfe --vfe-backend fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from voxelnet_tpu.ops.voxelize import VoxelGridSpec, _pallas_prepare


def _tpad(T: int) -> int:
    return -(-T // 8) * 8


def _kernel(sorted_ref, start_ref, mask_ref,
            w1_ref, a1_ref, w2_ref, a2_ref,
            out_ref, tab_ref):
    """One (frame, voxel-block) step.

    sorted_ref: (1, N + WIN, 4) f32 — frame's points sorted by voxel id,
        zero tail so the last aligned window read stays in bounds.
    start_ref:  (1, 1, V) i32 SMEM — per-voxel first-point index.
    mask_ref:   (1, V, TPAD) f32 — 1.0 where point-row t < count.
    w1_ref: (8, 16) f32 — VFE1 dense weight, input padded 7 -> 8.
    a1_ref: (2, 16) f32 — rows: [bias_after_dense, 0] is NOT the layout;
        row 0 = BN scale, row 1 = BN shift (affine from running stats),
        dense bias pre-folded into the affine? No — see a*_ref layout in
        `fused_feature_net`: row 0 = dense bias, row 1 = BN scale,
        row 2 = BN shift -> shape (3, C).
    w2_ref: (32, 64) f32, a2_ref: (3, 64) f32.
    out_ref: (1, V, 128) bf16 voxelwise features.
    tab_ref: (V * TPAD, 4) f32 scratch — the block's point table.
    """
    V = mask_ref.shape[1]
    TPAD = mask_ref.shape[2]
    win = TPAD + 8

    def copy_run(v, _):
        s = start_ref[0, 0, v]
        sa = pl.multiple_of((s // 8) * 8, 8)
        window = sorted_ref[0, pl.ds(sa, win), :]
        rolled = pltpu.roll(window, sa - s, 0)
        dst = pl.multiple_of(v * TPAD, 8)
        tab_ref[pl.ds(dst, TPAD), :] = rolled[:TPAD]
        return 0

    jax.lax.fori_loop(0, V, copy_run, 0)

    mask = mask_ref[0][..., None]                      # (V, TPAD, 1) f32
    t4 = tab_ref[:].reshape(V, TPAD, 4) * mask
    cnt = mask.sum(axis=1, keepdims=True)              # (V, 1, 1)
    centroid = t4[..., :3].sum(axis=1, keepdims=True) / jnp.maximum(cnt, 1.0)
    offs = (t4[..., :3] - centroid) * mask
    feat = jnp.concatenate(
        [t4, offs, jnp.zeros((V, TPAD, 1), jnp.float32)], axis=-1)

    neg = jnp.float32(-1e9)

    def vfe_layer(x, w_ref, a_ref):
        """Dense -> ReLU -> BN affine -> masked max -> concat (bf16 out)."""
        w = w_ref[:].astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + a_ref[0], 0.0)
        y = (y * a_ref[1] + a_ref[2]).astype(jnp.bfloat16)  # (V, TPAD, C)
        agg = jnp.max(jnp.where(mask > 0, y.astype(jnp.float32), neg),
                      axis=1, keepdims=True)           # (V, 1, C) f32
        aggb = jnp.broadcast_to(agg.astype(jnp.bfloat16),
                                y.shape)
        return (jnp.concatenate([y, aggb], axis=-1)
                * mask.astype(jnp.bfloat16)), agg

    x2, _ = vfe_layer(feat, w1_ref, a1_ref)            # (V, TPAD, 32)
    _, agg2 = vfe_layer(x2, w2_ref, a2_ref)            # agg2 (V, 1, 64)

    # final masked voxel max of concat(pw2, agg2-broadcast) == (agg2, agg2)
    # (models/vfe.py:83-90: the pointwise half's masked max IS agg2)
    vmask = (cnt[:, 0, :] > 0).astype(jnp.bfloat16)    # (V, 1)
    agg2 = agg2[:, 0, :].astype(jnp.bfloat16)          # (V, 64)
    out = jnp.concatenate([agg2, agg2], axis=-1) * vmask
    out_ref[0] = out


@functools.partial(
    jax.jit, static_argnames=("spec", "max_voxels", "block_voxels",
                              "interpret"))
def voxelize_vfe_fused(points: jnp.ndarray, num_points: jnp.ndarray,
                       spec: VoxelGridSpec, max_voxels: int,
                       fln_params: dict, fln_stats: dict,
                       block_voxels: int = 128,
                       interpret: bool = False):
    """Full fused path: padded raw points -> (voxelwise, coords, counts).

    points (B, N, 4), num_points (B,) -> voxelwise (B, K, 128) bf16,
    coords (B, K, 3) i32, counts (B, K) i32. The sort + run analysis stay
    XLA (2.4 ms/batch8 measured); table build + VFE fuse into the kernel.
    fln_params/fln_stats: the FeatureLearningNet variables
    (params/batch_stats subtrees).
    """
    T = spec.max_points_per_voxel
    TPAD = _tpad(T)
    WIN = TPAD + 8
    V = block_voxels
    if max_voxels % V:
        raise ValueError(f"max_voxels {max_voxels} % block {V} != 0")

    (sorted_pts, run_start, counts, coords, num_voxels, _) = jax.vmap(
        lambda p, n: _pallas_prepare(p, n, spec, max_voxels)
    )(points, num_points)
    b, n, _ = sorted_pts.shape
    padded = jnp.concatenate(
        [sorted_pts, jnp.zeros((b, WIN, 4), jnp.float32)], axis=1)
    rowmask = (jnp.arange(TPAD, dtype=jnp.int32)[None, None, :]
               < counts[:, :, None]).astype(jnp.float32)

    def dense_affine(name, cin_pad):
        d = fln_params[name]["fcn"]
        bn_p, bn_s = fln_params[name]["bn"], fln_stats[name]["bn"]
        w = jnp.zeros((cin_pad, d["kernel"].shape[1]), jnp.float32)
        w = w.at[: d["kernel"].shape[0]].set(d["kernel"].astype(jnp.float32))
        scale = (bn_p["scale"]
                 / jnp.sqrt(bn_s["var"] + 1e-5)).astype(jnp.float32)
        shift = (bn_p["bias"] - bn_s["mean"] * scale).astype(jnp.float32)
        aff = jnp.stack([d["bias"].astype(jnp.float32), scale, shift])
        return w, aff

    w1, a1 = dense_affine("vfe1", 8)
    w2, a2 = dense_affine("vfe2", 32)

    grid = (b, max_voxels // V)
    voxelwise = pl.pallas_call(
        _kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, max_voxels, 128), jnp.bfloat16),
        in_specs=[
            pl.BlockSpec((1, n + WIN, 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), lambda i, j: (i, 0, j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, V, TPAD), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 16), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 64), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 64), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, V, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((V * TPAD, 4), jnp.float32)],
        interpret=interpret,
    )(padded, run_start[:, None, :], rowmask, w1, a1, w2, a2)
    return voxelwise, coords, counts
