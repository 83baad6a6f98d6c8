"""Perf-only probe: W-paired middle convs — trade 4/3 FLOPs for full MXU width.

Every middle conv emits 64 channels, half-filling the 128-lane MXU
(scripts/probe_middle_mfu.py measured the width effect directly). This
prices the lossless repack: compute TWO adjacent W positions per output
row by expanding the (3,3,3,Cin,64) kernel into a (3,3,4,Cin,128) kernel
(zero-padded taps) applied with W-stride 2 — output (.., W/2, 128) is a
row-major relabeling of (.., W, 64), so the reshape back is free in
logical terms. Exact same math, 4/3 the MACs, full 128-wide outputs.

Times each reference block shape (voxelnet/model.py:206-210) both ways,
plus the full 3-block stack fwd and fwd+bwd, chained-salt timing
(CLAUDE.md: block_until_ready lies on the axon tunnel).

    python scripts/probe_wpack.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def wpack_kernel(w3: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) -> (3, 3, 4, Cin, 2*Cout) paired-W kernel.

    Window position p of the size-4 W window starting at 2u-1 reads
    X[2u-1+p]; the even output (w=2u) uses taps p=kw (kw 0..2), the odd
    output (w=2u+1) uses p=kw+1.
    """
    cin, cout = w3.shape[3], w3.shape[4]
    v = jnp.zeros((3, 3, 4, cin, 2 * cout), w3.dtype)
    for kw in range(3):
        v = v.at[:, :, kw, :, :cout].set(w3[:, :, kw])
        v = v.at[:, :, kw + 1, :, cout:].set(w3[:, :, kw])
    return v


def conv3d(x, w3, stride_d, pad_d):
    return jax.lax.conv_general_dilated(
        x, w3, window_strides=(stride_d, 1, 1),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv3d_wpack(x, w3, stride_d, pad_d):
    b, d, h, w, c = x.shape
    v = wpack_kernel(w3)
    y = jax.lax.conv_general_dilated(
        x, v, window_strides=(stride_d, 1, 2),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y.reshape(y.shape[:3] + (w, w3.shape[-1]))


_BLOCKS = ((128, 64, 2, 1), (64, 64, 1, 0), (64, 64, 2, 1))


def time_fn(fn, args, iters=20, repeats=3):
    run = jax.jit(fn)
    salt = run(jnp.float32(0), *args)
    float(salt)
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = salt
        for _ in range(iters):
            s = run(s * 1e-12, *args)
        float(s)
        walls.append((time.perf_counter() - t0) / iters)
    return min(walls) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grid", default="10,400,352")
    args = ap.parse_args()
    b = args.batch
    d, h, w = (int(x) for x in args.grid.split(","))

    key = jax.random.key(0)
    print(f"batch {b}, grid ({d},{h},{w})")

    # per-block standalone
    din = d
    ws = []
    for i, (cin, cout, sd, pd) in enumerate(_BLOCKS):
        key, k1, k2 = jax.random.split(key, 3)
        x = jax.random.normal(k1, (b, din, h, w, cin), jnp.bfloat16)
        w3 = (jax.random.normal(k2, (3, 3, 3, cin, cout), jnp.float32)
              * 0.05).astype(jnp.bfloat16)
        ws.append(w3)

        def base(salt, x, w3, sd=sd, pd=pd):
            return conv3d(x + salt.astype(x.dtype), w3, sd, pd).astype(
                jnp.float32).mean()

        def pack(salt, x, w3, sd=sd, pd=pd):
            return conv3d_wpack(x + salt.astype(x.dtype), w3, sd, pd).astype(
                jnp.float32).mean()

        ms0 = time_fn(base, (x, w3))
        ms1 = time_fn(pack, (x, w3))
        # numeric check on a small slice
        y0 = conv3d(x[:1, :, :32], w3, sd, pd)
        y1 = conv3d_wpack(x[:1, :, :32], w3, sd, pd)
        err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                    - y1.astype(jnp.float32))))
        dout = (din + 2 * pd - 3) // sd + 1
        gf = 2 * b * dout * h * w * cout * 27 * cin / 1e9
        print(f"block{i + 1} ({cin}->{cout}, sd={sd}): conv3d {ms0:.2f} ms "
              f"({gf / ms0:.1f} TF/s) | wpack {ms1:.2f} ms "
              f"({gf / ms1:.1f} TF/s eff) | max|d|={err:.2e}", flush=True)
        din = dout

    # full stack fwd and fwd+bwd
    key, k1 = jax.random.split(key)
    x0 = jax.random.normal(k1, (b, d, h, w, 128), jnp.bfloat16)

    def stack(x, ws, packed):
        conv = conv3d_wpack if packed else conv3d
        y = x
        for (cin, cout, sd, pd), w3 in zip(_BLOCKS, ws):
            y = jax.nn.relu(conv(y, w3, sd, pd))
        return y

    for packed in (False, True):
        def fwd(salt, x, *ws, packed=packed):
            return stack(x + salt.astype(x.dtype), ws, packed).astype(
                jnp.float32).mean()

        def fwdbwd(salt, x, *ws, packed=packed):
            loss, grads = jax.value_and_grad(
                lambda ws_: stack(x + salt.astype(x.dtype), ws_,
                                  packed).astype(jnp.float32).mean())(ws)
            return loss + sum(g.astype(jnp.float32).sum() for g in grads) * 0

        name = "wpack " if packed else "conv3d"
        msf = time_fn(fwd, (x0, *ws))
        msb = time_fn(fwdbwd, (x0, *ws))
        print(f"stack {name}: fwd {msf:.2f} ms | fwd+bwd(w) {msb:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
