"""Perf probe: channel-planar table build + planar VFE pricing.

The (B, K, T, 4) table costs ~29.7 ms/batch8 as an XLA row scatter and
the planar Pallas run-copy's closing transpose hits a 32x layout-padding
trap (BASELINE.md) — so the planar plan only works if the table is
consumed IN PLANAR SPACE. This prices the pieces on-chip:

  A. production scatter voxelize (table + features)     [reference]
  B. planar kernel alone (raw (B,4,K*128) out, no transpose)
  C. B + planar 7-feature build (mask, centroid, offsets)
  D. C + planar VFE fwd (two (C_out,C_in)x(C_in,P) matmuls + masked
     window max + concat) — the full train-forward replacement for
     voxelize+VFE.

    python scripts/probe_planar.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops.voxelize import (VoxelGridSpec, _pallas_prepare,
                                       voxelize_batch_jax)
from voxelnet_tpu.kernels.voxelize_pallas import build_voxel_table_planar


def time_fn(fn, args, iters=20, repeats=3):
    run = jax.jit(lambda salt, *a: fn(a[0] + salt, *a[1:])
                  .astype(jnp.float32).sum())
    s = run(jnp.float32(0), *args)
    float(s)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = s
        for _ in range(iters):
            x = run(x * 1e-20, *args)
        float(x)
        walls.append((time.perf_counter() - t0) / iters)
    return min(walls) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--max-voxels", type=int, default=16384)
    args = ap.parse_args()
    B, N, K = args.batch, args.max_points, args.max_voxels

    cfg = get_config("Car")
    spec = VoxelGridSpec.from_object_config(cfg.object)
    T = spec.max_points_per_voxel

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform([0, -40, -3], [70.4, 40, 1], (B, N, 3)),
        rng.uniform(0, 1, (B, N, 1))], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)
    nums = jnp.full((B,), N, jnp.int32)

    def scatter_full(p, n):
        return voxelize_batch_jax(p, n, spec, K, "xla").features

    def planar_prep(p, n):
        (sorted_pts, run_start, counts, coords, num_voxels,
         num_voxels_raw) = jax.vmap(
            lambda pp, nn: _pallas_prepare(pp, nn, spec, K))(p, n)
        return sorted_pts, run_start, counts

    def planar_raw(p, n):
        sorted_pts, run_start, counts = planar_prep(p, n)
        out = build_voxel_table_planar.__wrapped__ if False else None
        # call the kernel path without the closing transpose
        from voxelnet_tpu.kernels.voxelize_pallas import (
            _planar_kernel, _VSTRIDE)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        b, n_, _ = sorted_pts.shape
        npad = n_ + 2 * _VSTRIDE
        planar = jnp.concatenate([
            sorted_pts.transpose(0, 2, 1),
            jnp.zeros((b, 4, npad - n_), jnp.float32)], axis=2)
        V = min(128, K)
        out = pl.pallas_call(
            _planar_kernel,
            grid=(b, K // V),
            out_shape=jax.ShapeDtypeStruct((b, 4, K * _VSTRIDE),
                                           jnp.float32),
            in_specs=[
                pl.BlockSpec((1, 4, npad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, V), lambda i, j: (i, 0, j),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 4, V * _VSTRIDE),
                                   lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
        )(planar, run_start[:, None, :])
        return out, counts

    def planar_feat(p, n):
        out, counts = planar_raw(p, n)
        b = out.shape[0]
        tab = out.reshape(b, 4, K, 128)
        lane = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 1)
        mask = (lane[None] < counts[:, :, None]).astype(jnp.float32)
        tab = tab * mask[:, None]
        denom = jnp.maximum(counts, 1).astype(jnp.float32)[:, None, :, None]
        centroid = tab[:, :3].sum(axis=3, keepdims=True) / denom
        offs = (tab[:, :3] - centroid) * mask[:, None]
        feat = jnp.concatenate([tab, offs], axis=1)        # (b, 7, K, 128)
        return feat, mask

    def planar_vfe(p, n):
        feat, mask = planar_feat(p, n)
        b = feat.shape[0]
        x = feat.reshape(b, 7, K * 128).astype(jnp.bfloat16)
        maskb = mask.astype(jnp.bfloat16)
        w1 = jnp.zeros((16, 7), jnp.bfloat16) + 0.01
        w2 = jnp.zeros((64, 32), jnp.bfloat16) + 0.01

        def layer(x, w):
            y = jax.lax.dot_general(
                w, x, dimension_numbers=(((1,), (1,)), ((0,), (0,)))
            ) if False else jnp.einsum("oc,bcp->bop", w, x)
            y = jnp.maximum(y, 0)
            c = y.shape[1]
            y3 = y.reshape(b, c, K, 128)
            agg = jnp.max(jnp.where(mask[:, None] > 0,
                                    y3.astype(jnp.float32), -1e9),
                          axis=3, keepdims=True).astype(jnp.bfloat16)
            y3 = jnp.concatenate(
                [y3, jnp.broadcast_to(agg, y3.shape)], axis=1)
            return (y3 * maskb[:, None]).reshape(b, 2 * c, K * 128), agg

        x, _ = layer(x, w1)
        _, agg2 = layer(x, w2)
        return agg2

    for name, fn, out2 in (("A scatter voxelize+features", scatter_full,
                            False),
                           ("B planar kernel raw", planar_raw, True),
                           ("C planar + feature build", planar_feat, True),
                           ("D planar + features + VFE fwd", planar_vfe,
                            False)):
        f = ((lambda p, n, fn=fn: fn(p, n)[0]) if out2
             else (lambda p, n, fn=fn: fn(p, n)))
        print(f"{name}: compiling ...", flush=True)
        ms = time_fn(f, (pts, nums))
        print(f"{name}: {ms:.2f} ms/batch{B}", flush=True)


if __name__ == "__main__":
    main()
