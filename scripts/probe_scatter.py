"""Perf probe: scatter-to-dense vs index-scatter+gather dense build.

The trace (profiles/trace_summary.md) prices the dense (B,D,H,W,128)
grid build at ~19 ms of the 86 ms inference graph: zero-init broadcast
(2.88 GB) + row scatter + index prep. HBM floor is ~4 ms (write 2.88 GB
once). Hypothesis: scattering s32 ROW INDICES into a (D*H*W,) table
(45 MB) and then GATHERING feature rows linearizes the big write into
one dense gather the compiler can stream (and potentially fuse into the
consuming conv). Chained-salt timing, both formulations, real shapes.

    python scripts/probe_scatter.py [--batch 8]
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

from voxelnet_tpu.models.scatter import scatter_to_dense


def scatter_to_dense_gather(voxel_features, coords, counts, grid_dzyx):
    """Same contract as scatter_to_dense: (B,K,C)+(B,K,3) -> (B,D,H,W,C).

    Scatters only K row indices (s32) then gathers the (D*H*W, C) dense
    block from a (K+1, C) table whose last row is zeros (padding)."""
    D, H, W = grid_dzyx

    def one(feat, crd, cnt):
        K, C = feat.shape
        linear = (crd[:, 0] * H + crd[:, 1]) * W + crd[:, 2]
        linear = jnp.where(cnt > 0, linear, D * H * W)  # padding -> dropped
        idx = jnp.full((D * H * W,), K, jnp.int32)
        idx = idx.at[linear].set(jnp.arange(K, dtype=jnp.int32),
                                 mode="drop")
        table = jnp.concatenate(
            [feat, jnp.zeros((1, C), feat.dtype)], axis=0)
        return table[idx].reshape(D, H, W, C)

    return jax.vmap(one)(voxel_features, coords, counts)


def time_fn(fn, args, iters=20, repeats=3):
    run = jax.jit(lambda salt, *a: fn(a[0] + salt, *a[1:])
                  .astype(jnp.float32).sum())
    s = run(jnp.bfloat16(0), *args)
    float(s)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = s
        for _ in range(iters):
            x = run((x * 1e-20).astype(jnp.bfloat16), *args)
        float(x)
        walls.append((time.perf_counter() - t0) / iters)
    return min(walls) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-voxels", type=int, default=12288)
    ap.add_argument("--grid", default="10,400,352")
    args = ap.parse_args()
    D, H, W = (int(x) for x in args.grid.split(","))
    B, K, C = args.batch, args.max_voxels, 128

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((B, K, C)), jnp.bfloat16)
    # unique coords per frame (sorted linear ids, like the voxelizer's)
    lin = np.sort(np.stack([rng.choice(D * H * W, K, replace=False)
                            for _ in range(B)]))
    crd = np.stack([lin // (H * W), (lin // W) % H, lin % W], axis=-1)
    coords = jnp.asarray(crd, jnp.int32)
    counts = jnp.asarray(rng.integers(1, 35, (B, K)), jnp.int32)

    g = (D, H, W)

    @jax.jit
    def maxdiff(f, c, n):
        # both dense grids live only inside the jit; 2 x 2.88 GB would
        # OOM HBM if fetched separately
        a = scatter_to_dense(f, c, n, g).astype(jnp.float32)
        b = scatter_to_dense_gather(f, c, n, g).astype(jnp.float32)
        return jnp.abs(a - b).max()

    print(f"max |scatter - gather| = "
          f"{float(maxdiff(feat, coords, counts))} (must be 0.0)")

    def scatter_hinted(voxel_features, coords, counts, grid_dzyx):
        """scatter_to_dense with the XLA scatter hints the voxelizer's
        output licenses: linear ids are sorted and unique per frame."""
        D_, H_, W_ = grid_dzyx

        def one(f, c, n):
            linear = (c[:, 0] * H_ + c[:, 1]) * W_ + c[:, 2]
            linear = jnp.where(n > 0, linear, D_ * H_ * W_)
            dense = jnp.zeros((D_ * H_ * W_, f.shape[-1]), f.dtype)
            dense = dense.at[linear].set(
                f, mode="drop", indices_are_sorted=True,
                unique_indices=True)
            return dense.reshape(D_, H_, W_, f.shape[-1])

        return jax.vmap(one)(voxel_features, coords, counts)

    def scatter_1hint(sorted_hint, unique_hint):
        def impl(voxel_features, coords, counts, grid_dzyx):
            D_, H_, W_ = grid_dzyx

            def one(f, c, n):
                K_ = f.shape[0]
                linear = (c[:, 0] * H_ + c[:, 1]) * W_ + c[:, 2]
                # distinct OOB ids keep padding rows unique
                linear = jnp.where(
                    n > 0, linear,
                    D_ * H_ * W_ + jnp.arange(K_, dtype=linear.dtype))
                dense = jnp.zeros((D_ * H_ * W_, f.shape[-1]), f.dtype)
                dense = dense.at[linear].set(
                    f, mode="drop", indices_are_sorted=sorted_hint,
                    unique_indices=unique_hint)
                return dense.reshape(D_, H_, W_, f.shape[-1])

            return jax.vmap(one)(voxel_features, coords, counts)
        return impl

    for name, fn in (("scatter", scatter_to_dense),
                     ("scatter+hints", scatter_hinted),
                     ("unique-only", scatter_1hint(False, True)),
                     ("sorted-only", scatter_1hint(True, False)),
                     ("idx+gather", scatter_to_dense_gather)):
        ms = time_fn(lambda f, c, n: fn(f, c, n, g), (feat, coords, counts))
        print(f"{name}: {ms:.2f} ms/batch{B}", flush=True)


if __name__ == "__main__":
    main()
