"""Perf probe: slice-gather reformulations of the scatter-bound ops.

probe_scatter.py established the primitive asymmetry on v5e: row
scatters move ~10M rows/s while the dense idx+gather moved ~123M
rows/s — gathers are ~12x cheaper per row, and XLA gathers of
CONTIGUOUS MULTI-ROW SLICES amortize further. Two ops here are
expressible as slice gathers because the voxelizer's point stream is
sorted by voxel id (runs are contiguous):

  A. voxel TABLE build — table[k] = sorted_pts[start_k : start_k+T]
     (one gather of K (T,4) slices) vs the production per-point row
     scatter (~27 ms/batch8 inside the train graph).
  B. block-1 backward gathers — dL/dout rows at each voxel's 27
     neighbor sites, fetched as 9 gathers of K (3,Cout) slices
     (for fixed (kd,ky) the 3 kx sites are x-contiguous). This prices
     the sparse custom-VJP that would replace the dense conv3d
     grad-input (25.6 ms) + grad-weight (28.4 ms) fusions.

    python scripts/probe_gather.py [--batch 8]
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

from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax
from voxelnet_tpu.config import get_config


def time_fn(fn, args, iters=20, repeats=3, salt_dtype=jnp.float32):
    run = jax.jit(lambda salt, *a: fn(a[0] + salt, *a[1:])
                  .astype(jnp.float32).sum())
    s = run(salt_dtype(0), *args)
    float(s)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        x = s
        for _ in range(iters):
            x = run((x * 1e-20).astype(salt_dtype), *args)
        float(x)
        walls.append((time.perf_counter() - t0) / iters)
    return min(walls) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-points", type=int, default=65536)
    ap.add_argument("--max-voxels", type=int, default=16384)
    ap.add_argument("--case", default="all",
                    choices=("all", "parity", "table_scatter",
                             "table_gather", "bwd_slices", "bwd_rows"))
    args = ap.parse_args()
    B, N, K = args.batch, args.max_points, args.max_voxels
    case = args.case

    cfg = get_config("Car")
    spec = VoxelGridSpec.from_object_config(cfg.object)
    T = spec.max_points_per_voxel
    D, H, W = spec.grid_dzyx

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform([0, -40, -3], [70.4, 40, 1], (B, N, 3)),
        rng.uniform(0, 1, (B, N, 1))], axis=-1).astype(np.float32)
    pts = jnp.asarray(pts)
    nums = jnp.full((B,), N, jnp.int32)

    # ---- A. table build: production scatter path vs slice-gather -------
    def vox_scatter(p, n):
        v = voxelize_batch_jax(p, n, spec, K, "xla")
        return v.features

    from voxelnet_tpu.ops.voxelize import _pallas_prepare, _finalize

    def vox_gather(p, n):
        (sorted_pts, run_start, counts, coords, num_voxels,
         num_voxels_raw) = jax.vmap(
            lambda pp, nn: _pallas_prepare(pp, nn, spec, K))(p, n)
        b = sorted_pts.shape[0]
        padded = jnp.concatenate(
            [sorted_pts, jnp.zeros((b, T, 4), jnp.float32)], axis=1)

        def frame(flat, starts):
            return jax.vmap(lambda s: jax.lax.dynamic_slice(
                flat, (s, 0), (T, 4)))(starts)

        table = jax.vmap(frame)(padded, run_start)
        return _finalize(table, counts, coords, num_voxels, T,
                         num_voxels_raw).features

    if case == "parity":
        a = jax.jit(vox_scatter)(pts, nums)
        b_ = jax.jit(vox_gather)(pts, nums)
        print(f"A. table parity max|diff| = "
              f"{float(jnp.abs(a - b_).max())} (must be 0.0)", flush=True)
    for name, fn in (("scatter", vox_scatter), ("slice-gather", vox_gather)):
        if case not in ("all", f"table_{name.replace('slice-', '')}"):
            continue
        print(f"A. compiling table build [{name}] ...", flush=True)
        ms = time_fn(fn, (pts, nums))
        print(f"A. table build [{name}]: {ms:.2f} ms/batch{B}", flush=True)

    # ---- B. block-1 backward site gathers ------------------------------
    do, cout = (D + 2 - 3) // 2 + 1, 64
    dout = jnp.asarray(rng.standard_normal((B, do, H, W, cout)),
                       jnp.bfloat16)
    lin = np.sort(np.stack([rng.choice(D * H * W, K, replace=False)
                            for _ in range(B)]))
    crd = np.stack([lin // (H * W), (lin // W) % H, lin % W], axis=-1)
    coords = jnp.asarray(crd, jnp.int32)

    def bwd_gather(dgrid, crd_):
        """3 gathers of (1, 3, 3*cout) windows — one per depth tap: for
        fixed kd the whole (ky, kx) 3x3 neighborhood is one contiguous
        2D window of the zero-padded (do+2, H+2, (W+2)*cout) cotangent.
        49k slices/frame instead of 147k (the 9x (3,cout) variant)."""
        dpad = jnp.pad(dgrid, ((1, 1), (1, 1), (1, 1), (0, 0)))
        dpad = dpad.reshape(do + 2, H + 2, (W + 2) * cout)
        z, y, x = crd_[:, 0], crd_[:, 1], crd_[:, 2]
        outs = []
        for kd in range(3):
            num = z + 1 - kd
            oz_pad = jnp.clip(jnp.where(num % 2 == 0, num // 2 + 1, 0),
                              0, do + 1)
            sl = jax.vmap(lambda a, b, c: jax.lax.dynamic_slice(
                dpad, (a, b, c), (1, 3, 3 * cout)))(
                oz_pad, y, x * cout)
            outs.append(sl)
        return jnp.stack(outs, axis=1)

    if case in ("all", "bwd_slices"):
        print("B. compiling bwd slice-gather ...", flush=True)
        ms = time_fn(lambda d, c: jax.vmap(bwd_gather)(d, c),
                     (dout, coords), salt_dtype=jnp.bfloat16)
        print(f"B. bwd 27-site slice-gather (9x (3,{cout})): "
              f"{ms:.2f} ms/batch{B}", flush=True)
    if case not in ("all", "bwd_rows"):
        return

    # row-gather variant for comparison (27 separate rows per voxel)
    def bwd_rows(dgrid, crd_):
        dflat = dgrid.reshape(do * H * W, cout)
        z, y, x = crd_[:, 0], crd_[:, 1], crd_[:, 2]
        idx = []
        for kd in range(3):
            oz = jnp.clip((z + 1 - kd) // 2, 0, do - 1)
            for ky in range(3):
                oy = jnp.clip(y + 1 - ky, 0, H - 1)
                for kx in range(3):
                    ox = jnp.clip(x + 1 - kx, 0, W - 1)
                    idx.append((oz * H + oy) * W + ox)
        return dflat[jnp.stack(idx, axis=1)]

    ms = time_fn(lambda d, c: jax.vmap(bwd_rows)(d, c), (dout, coords),
                 salt_dtype=jnp.bfloat16)
    print(f"B. bwd 27-site row-gather: {ms:.2f} ms/batch{B}", flush=True)


if __name__ == "__main__":
    main()
