"""Perf-only probe: does widening the middle Conv3D channels raise MFU?

The committed trace (profiles/trace_summary.md) shows the middle stack
at ~43 ms of the 86 ms inference graph, with block-1's Conv3D at ~22%
MFU. One hypothesis is that the channel-64 outputs half-fill the
128-lane vector registers / MXU contraction, so a channel-128 middle
would be "free" (2x FLOPs at 2x efficiency). This times the 3-block
middle stack standalone with the reference C=64 vs a widened C=128,
random weights, chained-salt timing (CLAUDE.md: block_until_ready lies
on the axon tunnel). Numbers go to BASELINE.md's MFU section; widening
changes semantics vs the reference (voxelnet/model.py:206-210), so it
is a measurement, not a default.

    python scripts/probe_middle_mfu.py
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
from flax import linen as nn


class MiddleStack(nn.Module):
    """Reference middle topology ((2,1)/(1,0)/(2,1) depth strides/pads,
    voxelnet/model.py:206-210) with a configurable channel width."""

    cout: int

    @nn.compact
    def __call__(self, x):
        for stride_d, pad_d in ((2, 1), (1, 0), (2, 1)):
            x = nn.Conv(self.cout, kernel_size=(3, 3, 3),
                        strides=(stride_d, 1, 1),
                        padding=((pad_d, pad_d), (1, 1), (1, 1)),
                        dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
        return x


def time_stack(cout, batch, d, h, w, cin, iters=20, repeats=3):
    model = MiddleStack(cout)
    x = jnp.zeros((batch, d, h, w, cin), jnp.bfloat16)
    params = model.init(jax.random.key(0), x)

    @jax.jit
    def run(x, salt):
        # chained salt: each iter depends on the last fetch-free
        y = model.apply(params, x + salt)
        return y.astype(jnp.float32).mean()

    salt = run(x, jnp.float32(0))  # strong f32: same aval as timed calls
    float(salt)  # sync
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = salt
        for _ in range(iters):
            s = run(x, s * 1e-12)
        float(s)
        walls.append((time.perf_counter() - t0) / iters)
    ms = min(walls) * 1e3
    # analytic FLOPs of the 3 convs
    flops = 0
    din, c = d, cin
    for stride_d, pad_d in ((2, 1), (1, 0), (2, 1)):
        dout = (din + 2 * pad_d - 3) // stride_d + 1
        flops += 2 * batch * dout * h * w * cout * (27 * c)
        din, c = dout, cout
    tf = flops / (ms / 1e3) / 1e12
    return ms, flops / 1e9, tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grid", default="10,400,352",
                    help="D,H,W of the dense voxel grid")
    args = ap.parse_args()
    d, h, w = (int(x) for x in args.grid.split(","))

    peak = 197.0  # v5e ("TPU v5 lite") bf16 TFLOP/s; 394 is the INT8 number
    print(f"batch {args.batch}, grid ({d},{h},{w}), cin=128")
    for cout in (64, 128):
        ms, gf, tf = time_stack(cout, args.batch, d, h, w, 128)
        print(f"middle C={cout}: {ms:.1f} ms/batch, {gf:.0f} GFLOP, "
              f"{tf:.1f} TFLOP/s = {100 * tf / peak:.1f}% MFU",
              flush=True)


if __name__ == "__main__":
    main()
