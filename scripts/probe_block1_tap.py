#!/usr/bin/env python
"""Probe: middle block-1 — W-paired Conv3D vs depth-tap paired Conv2Ds.

fusion.17 (the dense scatter fused with block-1's wpack Conv3D) is
33.8% of the B24 inference graph at ~69% of issued-MAC MFU while
blocks 2-3 run at ~99% (profiles/r4/trace_infer_r4.md). Hypothesis:
the depth-stride-2 3D conv tiles worse than 2D convs; decomposing into
its 3 depth taps — each a W-paired (3, 4, 128, 128) Conv2D over the
merged (B, D') batch, summed — keeps the exact MACs and the pairing
but gives XLA plain 2D shapes. (tap2d lost before, but that was
all-blocks AND unpaired.)

Run: python scripts/probe_block1_tap.py [--batch 8]

MEASURED (v5e, B8): NO WIN — 208.9 ms (wpack 3D) vs 211.1 ms (3-tap
paired 2D), equal within noise, so the decomposition is not wired into
the middle stack. Note the standalone numbers are ~8x the IN-GRAPH
block-1 cost (fusion.17: ~24.5 ms/B8-equivalent): with a fixed
default-layout jit argument, XLA cannot pick the conv-optimal
{4,0,3,2,1} activation layout it uses inside the full graph — a
reminder that single-op probes under-report graph-level conv
performance and only the RELATIVE comparison here is meaningful.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.models.middle import _wpack_impl

    B, D, H, W, C = args.batch, 10, 400, 352, 128
    COUT, SD, PD = 64, 2, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, D, H, W, C)).astype(np.float32),
                    jnp.bfloat16)
    w3 = jnp.asarray(
        rng.normal(0, 0.05, (3, 3, 3, C, COUT)).astype(np.float32),
        jnp.bfloat16)
    x = jax.device_put(x)

    def wpack3d(x):
        return _wpack_impl(x, w3, SD, PD)

    def tap_paired(x):
        b = x.shape[0]
        dout = (D + 2 * PD - 3) // SD + 1
        xp = jnp.pad(x, ((0, 0), (PD, PD), (0, 0), (0, 0), (0, 0)))
        y = None
        for kd in range(3):
            sl = xp[:, kd: kd + SD * (dout - 1) + 1: SD]
            sl = sl.reshape(b * dout, H, W, C)
            v = jnp.zeros((3, 4, C, 2 * COUT), w3.dtype)
            for kw in range(3):
                v = v.at[:, kw, :, :COUT].set(w3[kd, :, kw])
                v = v.at[:, kw + 1, :, COUT:].set(w3[kd, :, kw])
            z = jax.lax.conv_general_dilated(
                sl, v, window_strides=(1, 2), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = z if y is None else y + z
        return y.reshape(b, dout, H, W // 2, 2 * COUT)

    def timed(fn, label):
        run = jax.jit(lambda x, salt: fn(
            x + salt.astype(x.dtype)).astype(jnp.float32).sum() * 0.0)
        s = run(x, jnp.bfloat16(0))
        float(s)
        t0 = time.perf_counter()
        s = jnp.bfloat16(0)
        for _ in range(args.iters):
            s = run(x, s)
        float(s)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        macs = B * 5 * H * (W // 2) * 2 * COUT * (3 * 3 * 4 * C)
        print(f"{label:24s} {ms:7.2f} ms/batch{B}  "
              f"({2 * macs / (ms / 1e3) / 1e12:5.1f} TFLOP/s of "
              "issued MACs)")
        return np.asarray(run(x, jnp.bfloat16(0)))

    timed(wpack3d, "wpack Conv3D (current)")
    timed(tap_paired, "3x depth-tap paired 2D")
    # equivalence spot check
    a = np.asarray(jax.jit(wpack3d)(x)[:1], np.float32)
    b = np.asarray(jax.jit(tap_paired)(x)[:1], np.float32)
    err = np.abs(a - b).max()
    print(f"max |diff| (bf16 summation order): {err:.4f}")


if __name__ == "__main__":
    main()
