"""Perf probe: sparse lowerings of the middle block-1 Conv3D.

The op-level trace (profiles/trace_summary.md) prices block-1 at 28 ms
of the 86 ms B8 inference module and the dense (B,10,400,352,128) grid
build at another ~12-19 ms — yet only ~1% of 3D voxels are occupied
(13.9k of 1.4M, real frames) and only ~6.3% of block-1 OUTPUT sites
(44k of 704k) have any occupied voxel in their receptive field. Since
unoccupied input sites are exactly zero (the scatter fills zeros), a
site with an all-empty receptive field outputs exactly `bias` — so an
EXACT sparse block-1 can skip 93% of the conv and, because it reads the
(B, K, 128) VFE table directly, skip the 128-channel dense scatter
entirely.

Formulations measured here against the dense baseline (all exact,
max-diff-checked):

  A. input-stationary: ONE matmul (B,K,128)@(128,27*64) (the 1728-wide
     output dim fills the MXU lanes that the dense conv's 64 channels
     half-fill), then 27 per-offset scatter-ADDs into the bias-filled
     (B, 5*H*W, 64) output grid. Per offset the target ids of valid
     rows stay sorted & unique (the voxelizer emits coords sorted by
     linear id; each offset shifts ids by a constant), but invalid
     rows (depth parity / boundary) interleave, so only unique=True is
     claimable.
  A1. same matmul, one combined (B, 27K, 64) scatter-add.
  B. output-stationary: compact the active output sites (occupancy
     scatter -> 3x3x3/stride-2 max reduce_window -> cumsum stream
     compaction, all static shapes), build a (B, D*H*W) int32 row-index
     grid, then 27x (index gather -> row gather -> matmul) and one
     sorted+unique scatter of the (B, K_out, 64) result.

    python scripts/probe_sparse_block1.py [--batch 8]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from voxelnet_tpu.config import get_config
from voxelnet_tpu.models.scatter import scatter_to_dense
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, in_grid_mask, voxelize_np

DATA_GLOB = ("/root/reference/data/2011_09_26/*/velodyne_points/data/"
             "*.bin")

STRIDE_D, PAD_D = 2, 1
COUT = 64


def load_real_coords(batch: int, max_voxels: int, spec: VoxelGridSpec):
    """Real-frame voxel coords (locality + active-site counts matter;
    random coords would dilate to ~27x instead of the real ~3.2x)."""
    files = sorted(glob.glob(DATA_GLOB))
    coords = np.zeros((batch, max_voxels, 3), np.int32)
    counts = np.zeros((batch, max_voxels), np.int32)
    for i in range(batch):
        pts = np.fromfile(files[i % len(files)], np.float32).reshape(-1, 4)
        pts = pts[in_grid_mask(pts, spec)]
        v = voxelize_np(pts, spec, max_voxels=max_voxels)
        k = v.num_voxels
        coords[i, :k] = v.coords[:k]
        counts[i, :k] = v.counts[:k]
    return jnp.asarray(coords), jnp.asarray(counts)


def offsets_27():
    return [(kd, ky, kx) for kd in range(3) for ky in range(3)
            for kx in range(3)]


def dense_block1(feat, coords, counts, kernel, bias, grid_dzyx,
                 hints=True):
    dense = scatter_to_dense(feat, coords, counts, grid_dzyx,
                             indices_sorted=hints)
    y = jax.lax.conv_general_dilated(
        dense, kernel.astype(dense.dtype),
        window_strides=(STRIDE_D, 1, 1),
        padding=((PAD_D, PAD_D), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias.astype(y.dtype)


def sparse_a(feat, coords, counts, kernel, bias, grid_dzyx,
             combined=False, acc_dtype=jnp.float32):
    """Input-stationary: one (128 -> 27*64) matmul + 27 scatter-adds."""
    D, H, W = grid_dzyx
    Do = (D + 2 * PAD_D - 3) // STRIDE_D + 1
    B, K, C = feat.shape
    wflat = kernel.reshape(27 * C, COUT).reshape(3, 3, 3, C, COUT)
    wmat = jnp.transpose(kernel, (3, 0, 1, 2, 4)).reshape(C, 27 * COUT)
    vals = (feat @ wmat.astype(feat.dtype)).astype(acc_dtype)
    vals = vals.reshape(B, K, 27, COUT)
    del wflat

    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    live = counts > 0

    def one(v, zz, yy, xx, lv):
        out = jnp.zeros((Do * H * W, COUT), acc_dtype)
        if combined:
            lins, vs = [], []
        for o, (kd, ky, kx) in enumerate(offsets_27()):
            num = zz + PAD_D - kd
            oz = num // STRIDE_D
            oy = yy + PAD_D - ky
            ox = xx + PAD_D - kx
            ok = (lv & (num % STRIDE_D == 0) & (oz >= 0) & (oz < Do)
                  & (oy >= 0) & (oy < H) & (ox >= 0) & (ox < W))
            lin = (oz * H + oy) * W + ox
            lin = jnp.where(ok, lin,
                            Do * H * W + jnp.arange(K, dtype=lin.dtype))
            if combined:
                lins.append(lin)
                vs.append(v[:, o])
            else:
                out = out.at[lin].add(v[:, o], mode="drop",
                                      unique_indices=True)
        if combined:
            out = out.at[jnp.concatenate(lins)].add(
                jnp.concatenate(vs), mode="drop")
        return out

    out = jax.vmap(one)(vals, z, y, x, live)
    return (out + bias.astype(out.dtype)).reshape(
        B, Do, H, W, COUT).astype(feat.dtype)


def sparse_b(feat, coords, counts, kernel, bias, grid_dzyx, k_out):
    """Output-stationary: compact active outputs, gather + matmul."""
    D, H, W = grid_dzyx
    Do = (D + 2 * PAD_D - 3) // STRIDE_D + 1
    B, K, C = feat.shape
    live = counts > 0

    lin_in = ((coords[..., 0] * H + coords[..., 1]) * W + coords[..., 2])
    lin_in = jnp.where(live, lin_in,
                       D * H * W + jnp.arange(K, dtype=lin_in.dtype))

    def one(f, li):
        # 1. occupancy grid + receptive-field dilation (= output active)
        occ = jnp.zeros((D * H * W,), jnp.int8).at[li].set(
            1, mode="drop", indices_are_sorted=True, unique_indices=True)
        act = jax.lax.reduce_window(
            occ.reshape(D, H, W), np.int8(0), jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(STRIDE_D, 1, 1),
            padding=((PAD_D, PAD_D), (1, 1), (1, 1)))
        flat = act.reshape(-1)
        # 2. stream-compact active flat ids into a static (k_out,) list
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        pos = jnp.where(flat > 0, pos, k_out)
        # inactive slots get DISTINCT out-of-range ids (base + slot) so
        # the unique_indices claim on the final scatter stays sound —
        # same trick as models/sparse_conv.py and scatter_to_dense
        ids = (Do * H * W + jnp.arange(k_out, dtype=jnp.int32)).at[pos].set(
            jnp.arange(Do * H * W, dtype=jnp.int32), mode="drop")
        # 3. input row-index grid
        idx = jnp.full((D * H * W,), -1, jnp.int32).at[li].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        # 4. gather + matmul per offset
        oz = ids // (H * W)
        oy = (ids // W) % H
        ox = ids % W
        acc = jnp.zeros((k_out, COUT), jnp.float32)
        for kd, ky, kx in offsets_27():
            iz = oz * STRIDE_D + kd - PAD_D
            iy = oy + ky - PAD_D
            ix = ox + kx - PAD_D
            inb = ((iz >= 0) & (iz < D) & (iy >= 0) & (iy < H)
                   & (ix >= 0) & (ix < W) & (ids < Do * H * W))
            l = jnp.where(inb, (iz * H + iy) * W + ix, 0)
            row = jnp.where(inb, idx[l], -1)
            g = jnp.where((row >= 0)[:, None],
                          f[jnp.maximum(row, 0)], 0).astype(f.dtype)
            acc = acc + (g @ kernel[kd, ky, kx].astype(g.dtype)
                         ).astype(jnp.float32)
        # 5. densify: bias-filled grid, sorted+unique scatter
        out = jnp.full((Do * H * W, COUT), bias, jnp.float32)
        out = out.at[ids].set(acc + bias, mode="drop",
                              indices_are_sorted=True, unique_indices=True)
        return out

    out = jax.vmap(one)(feat, lin_in)
    return out.reshape(B, Do, H, W, COUT).astype(feat.dtype)


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
    ap.add_argument("--k-out", type=int, default=49152)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate keys to run "
                         "(dense,a,a16,a1,b) — one per invocation keeps "
                         "each chip run to ~2 remote compiles")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the correctness diff (saves one compile; "
                         "use after a CPU equivalence pass)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (never touches the "
                         "exclusive TPU chip; JAX_PLATFORMS is ignored "
                         "by the axon plugin)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    config = get_config()
    spec = VoxelGridSpec.from_object_config(config.object)
    g = tuple(config.object.grid_size)
    K = config.data.max_voxels
    B, C = args.batch, 128

    coords, counts = load_real_coords(B, K, spec)
    print(f"real frames: K live = "
          f"{[int(c) for c in (counts > 0).sum(1)]} of {K}")
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((B, K, C)), jnp.bfloat16)
    feat = jnp.where((counts > 0)[..., None], feat, 0)
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, 3, C, COUT)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((COUT,)) * 0.1, jnp.float32)

    ref = None
    cands = (
        ("dense", "dense scatter+conv3d (baseline)",
         lambda f, c, n: dense_block1(f, c, n, kernel, bias, g)),
        ("a", "A  27 scatter-adds f32",
         lambda f, c, n: sparse_a(f, c, n, kernel, bias, g)),
        ("a16", "A  27 scatter-adds bf16-acc",
         lambda f, c, n: sparse_a(f, c, n, kernel, bias, g,
                                  acc_dtype=jnp.bfloat16)),
        ("a1", "A1 combined scatter-add",
         lambda f, c, n: sparse_a(f, c, n, kernel, bias, g, combined=True)),
        ("b", "B  output-stationary gather",
         lambda f, c, n: sparse_b(f, c, n, kernel, bias, g, args.k_out)),
    )
    only = set(args.only.split(",")) if args.only else None
    for key, name, fn in cands:
        if only is not None and key not in only:
            continue
        if not args.no_check:
            out = jax.jit(fn)(feat, coords, counts)
            if key == "dense":
                ref = np.asarray(out, np.float32)
                scale = float(np.abs(ref).max())
                print(f"ref |max| = {scale:.3f}")
            elif ref is not None:
                diff = float(np.abs(np.asarray(out, np.float32) - ref).max())
                print(f"{name}: max|diff| = {diff:.5f} "
                      f"({diff / scale:.2e} rel)")
        ms = time_fn(fn, (feat, coords, counts), iters=args.iters)
        print(f"{name}: {ms:.2f} ms/batch{B}", flush=True)


if __name__ == "__main__":
    main()
