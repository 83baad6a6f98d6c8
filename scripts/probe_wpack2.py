"""Perf-only probe: paired-throughout middle stack vs unpair-between.

The round-3 trace (profiles/trace_r3b.md) shows ~19 ms/B8 of layout
copies around the wpack blocks' unpair->activation->repair boundaries.
This prices keeping the activations in the PAIRED (.., W/2, 128) layout
end-to-end: blocks 2-3 consume the paired tensor directly via a
structured (3,3,3,2*Cin,2*Cout) kernel ("ppack" — 2x the exact MACs at
full K/N MXU fill, vs wpack's 4/3 at K=64), activations stay 128-lane,
and ONE reshape at the end restores (.., W, 64).

    python scripts/probe_wpack2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_tpu.models.middle import _conv3d_raw, _wpack_impl

_BLOCKS = ((128, 64, 2, 1), (64, 64, 1, 0), (64, 64, 2, 1))


def ppack_kernel(w3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (3,3,3,2*Cin,2*Cout) paired-in/paired-out
    W kernel: input pair u carries (X[2u] | X[2u+1]) in channels, output
    pair likewise; the W conv becomes a stride-1 size-3 conv over pairs
    with half-block-structured taps."""
    cin, cout = w3.shape[3], w3.shape[4]
    v = jnp.zeros((3, 3, 3, 2 * cin, 2 * cout), w3.dtype)
    # even output Y[2u] = sum_kw X[2u+kw-1] W[kw]
    v = v.at[:, :, 0, cin:, :cout].set(w3[:, :, 0])   # X[2u-1] = P[u-1] odd
    v = v.at[:, :, 1, :cin, :cout].set(w3[:, :, 1])   # X[2u]   = P[u] even
    v = v.at[:, :, 1, cin:, :cout].set(w3[:, :, 2])   # X[2u+1] = P[u] odd
    # odd output Y[2u+1] = sum_kw X[2u+kw] W[kw]
    v = v.at[:, :, 1, :cin, cout:].set(w3[:, :, 0])
    v = v.at[:, :, 1, cin:, cout:].set(w3[:, :, 1])
    v = v.at[:, :, 2, :cin, cout:].set(w3[:, :, 2])
    return v


def ppack_conv(xp, w3, stride_d, pad_d):
    """Paired (B, D, H, U, 2*Cin) -> paired (B, D', H, U, 2*Cout)."""
    v = ppack_kernel(w3)
    return jax.lax.conv_general_dilated(
        xp, v, window_strides=(stride_d, 1, 1),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


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
    b, d, h, w = 8, 10, 400, 352
    key = jax.random.key(0)
    ws = []
    din = d
    for cin, cout, sd, pd in _BLOCKS:
        key, k = jax.random.split(key)
        ws.append((jax.random.normal(k, (3, 3, 3, cin, cout), jnp.float32)
                   * 0.05).astype(jnp.bfloat16))
    key, k1 = jax.random.split(key)
    x0 = jax.random.normal(k1, (b, d, h, w, 128), jnp.bfloat16)

    def stack_conv3d(salt, x, *ws):
        y = x + salt.astype(x.dtype)
        for (cin, cout, sd, pd), w3 in zip(_BLOCKS, ws):
            y = jax.nn.relu(_conv3d_raw(y, w3, sd, pd))
        return y.astype(jnp.float32).mean()

    def stack_wpack(salt, x, *ws):
        """unpair between blocks (the production wpack composition)"""
        y = x + salt.astype(x.dtype)
        for (cin, cout, sd, pd), w3 in zip(_BLOCKS, ws):
            yp = _wpack_impl(y, w3, sd, pd)
            y = jax.nn.relu(yp).reshape(yp.shape[:3] + (w, cout))
        return y.astype(jnp.float32).mean()

    def stack_paired(salt, x, *ws):
        """paired throughout: wpack block 1, ppack blocks 2-3, one
        closing reshape"""
        y = x + salt.astype(x.dtype)
        (c1, o1, s1, p1), (c2, o2, s2, p2), (c3, o3, s3, p3) = _BLOCKS
        yp = jax.nn.relu(_wpack_impl(y, ws[0], s1, p1))
        yp = jax.nn.relu(ppack_conv(yp, ws[1], s2, p2))
        yp = jax.nn.relu(ppack_conv(yp, ws[2], s3, p3))
        y = yp.reshape(yp.shape[:3] + (w, o3))
        return y.astype(jnp.float32).mean()

    # numeric check on a small slice
    xs = x0[:1, :, :16]
    def run_small(f):
        class S:  # reuse stack fns with w captured
            pass
        return f
    y_ref = None
    for name, fn in (("conv3d", stack_conv3d), ("wpack", stack_wpack),
                     ("paired", stack_paired)):
        pass
    # direct value check
    def vals_conv3d(x):
        y = x
        for (cin, cout, sd, pd), w3 in zip(_BLOCKS, ws):
            y = jax.nn.relu(_conv3d_raw(y, w3, sd, pd))
        return y

    def vals_paired(x):
        (c1, o1, s1, p1), (c2, o2, s2, p2), (c3, o3, s3, p3) = _BLOCKS
        yp = jax.nn.relu(_wpack_impl(x, ws[0], s1, p1))
        yp = jax.nn.relu(ppack_conv(yp, ws[1], s2, p2))
        yp = jax.nn.relu(ppack_conv(yp, ws[2], s3, p3))
        return yp.reshape(yp.shape[:3] + (x.shape[3], o3))

    va = vals_conv3d(xs).astype(jnp.float32)
    vb = vals_paired(xs).astype(jnp.float32)
    print("paired stack max|d| vs conv3d:",
          float(jnp.max(jnp.abs(va - vb))), flush=True)

    for name, fn in (("conv3d", stack_conv3d), ("wpack ", stack_wpack),
                     ("paired", stack_paired)):
        ms = time_fn(fn, (x0, *ws))
        print(f"stack {name}: fwd {ms:.2f} ms", flush=True)

    # fwd+bwd(weights) for the two candidates
    for name, stack in (("wpack ", stack_wpack), ("paired", stack_paired)):
        def fwdbwd(salt, x, *ws_, stack=stack):
            loss, grads = jax.value_and_grad(
                lambda t: stack(salt, x, *t))(tuple(ws_))
            return loss + sum(g.astype(jnp.float32).sum()
                              for g in grads) * 0
        ms = time_fn(fwdbwd, (x0, *ws))
        print(f"stack {name}: fwd+bwd(w) {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
