#!/usr/bin/env python
"""Probe: sparse->dense grid build — scatter vs searchsorted+gather.

The (B, K, 128) -> (B, D*H*W, 128) dense build is the last structural
non-conv cost in the inference graph (~12.4 ms/B8 with scatter hints on
v5e — ~230 GB/s against an ~820 GB/s HBM peak; the tensor itself is
~2.9 GB at B8, so speed-of-light is ~3.5 ms). XLA's TPU scatter
serializes row updates (~10M rows/s, probe_scatter.py); the occupied
voxel ids are SORTED and unique, so the same map can be built with zero
scatters: for every grid cell, binary-search the cell id in the sorted
voxel ids (searchsorted: log2(K) vectorized compares over an iota — no
memory traffic to speak of) and row-GATHER the voxel features, masking
misses. Gathers don't have the scatter's read-modify-write hazard, so
XLA can pipeline them at streaming rates.

Run on the TPU chip:  python scripts/probe_dense_gather.py [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.models.scatter import (scatter_to_dense,
                                             scatter_to_dense_gather)

    config = get_config("Car")
    D, H, W = config.object.grid_size
    K = config.data.max_voxels
    B, C = args.batch, 128
    rng = np.random.default_rng(0)

    # realistic occupancy: ~12-14k occupied voxels, sorted ascending ids
    nv = 13000
    feats = rng.normal(0, 1, (B, K, C)).astype(np.float32).astype(
        jnp.bfloat16)
    coords = np.zeros((B, K, 3), np.int32)
    counts = np.zeros((B, K), np.int32)
    for b in range(B):
        ids = np.sort(rng.choice(D * H * W, nv, replace=False))
        coords[b, :nv, 0] = ids // (H * W)
        coords[b, :nv, 1] = (ids // W) % H
        coords[b, :nv, 2] = ids % W
        counts[b, :nv] = 1
    feats = jax.device_put(feats)
    coords = jax.device_put(jnp.asarray(coords))
    counts = jax.device_put(jnp.asarray(counts))

    def timed(fn, label):
        chained = jax.jit(
            lambda f, c, n, salt: fn(f + salt, c, n).sum().astype(
                jnp.float32) * 0.0)
        salt = chained(feats, coords, counts, jnp.bfloat16(0))
        float(salt)
        t0 = time.perf_counter()
        salt = jnp.bfloat16(0)
        for _ in range(args.iters):
            salt = chained(feats, coords, counts, salt)
        float(salt)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        gb = B * D * H * W * C * 2 / 1e9
        print(f"{label:30s} {ms:7.2f} ms/batch{B}  "
              f"({gb / (ms / 1e3):6.1f} GB/s effective)")
        return ms

    grid = (D, H, W)
    timed(lambda f, c, n: scatter_to_dense(f, c, n, grid,
                                           indices_sorted=False),
          "scatter (no hints)")
    timed(lambda f, c, n: scatter_to_dense(f, c, n, grid,
                                           indices_sorted=True),
          "scatter (sorted+unique hints)")
    timed(lambda f, c, n: scatter_to_dense_gather(f, c, n, grid),
          "searchsorted + gather")
    from voxelnet_tpu.models.scatter import scatter_to_dense_streamed

    timed(lambda f, c, n: scatter_to_dense_streamed(f, c, n, grid),
          "pallas streamed block-fill")


if __name__ == "__main__":
    main()
