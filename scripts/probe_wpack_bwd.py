"""Perf-only probe: which VJP formulation for the wpack middle convs?

The forward winner is the W-paired conv (scripts/probe_wpack.py). Its
backward decomposes into grad-input (a transposed conv with 128 output
channels — already full MXU width in the dense formulation) and
grad-weight (a correlation with N=64 output channels — half width in
the dense formulation, full width in the paired one, whose (3,3,4,128)
result folds back to the (3,3,3,64) weight exactly). This times the
three combinations per block shape:

  dense/dense   — the conv3d VJP (what _wpack_bwd pins today)
  paired/paired — the paired conv's own VJP
  dense/paired  — dense grad-input + paired grad-weight (candidate)

    python scripts/probe_wpack_bwd.py
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
    din = d
    for i, (cin, cout, sd, pd) in enumerate(_BLOCKS):
        key, k1, k2, k3 = jax.random.split(key, 4)
        dout = (din + 2 * pd - 3) // sd + 1
        x = jax.random.normal(k1, (b, din, h, w, cin), jnp.bfloat16)
        w3 = (jax.random.normal(k2, (3, 3, 3, cin, cout), jnp.float32)
              * 0.05).astype(jnp.bfloat16)
        g = jax.random.normal(k3, (b, dout, h, w, cout), jnp.bfloat16)
        gp = g.reshape(b, dout, h, w // 2, 2 * cout)

        def dx_dense(salt, x, w3, g, sd=sd, pd=pd):
            out = jax.linear_transpose(
                lambda x_: _conv3d_raw(x_, w3, sd, pd), x)(
                    g + salt.astype(g.dtype))[0]
            return out.astype(jnp.float32).mean()

        def dw_dense(salt, x, w3, g, sd=sd, pd=pd):
            out = jax.linear_transpose(
                lambda w_: _conv3d_raw(x, w_, sd, pd), w3)(
                    g + salt.astype(g.dtype))[0]
            return out.astype(jnp.float32).mean()

        def dx_paired(salt, x, w3, gp, sd=sd, pd=pd):
            out = jax.linear_transpose(
                lambda x_: _wpack_impl(x_, w3, sd, pd), x)(
                    gp + salt.astype(gp.dtype))[0]
            return out.astype(jnp.float32).mean()

        def dw_paired(salt, x, w3, gp, sd=sd, pd=pd):
            out = jax.linear_transpose(
                lambda w_: _wpack_impl(x, w_, sd, pd), w3)(
                    gp + salt.astype(gp.dtype))[0]
            return out.astype(jnp.float32).mean()

        ms = {
            "dx dense ": time_fn(dx_dense, (x, w3, g)),
            "dx paired": time_fn(dx_paired, (x, w3, gp)),
            "dw dense ": time_fn(dw_dense, (x, w3, g)),
            "dw paired": time_fn(dw_paired, (x, w3, gp)),
        }
        # numeric check: paired grad-weight folds back exactly
        dwd = jax.linear_transpose(
            lambda w_: _conv3d_raw(x, w_, sd, pd), w3)(g)[0]
        dwp = jax.linear_transpose(
            lambda w_: _wpack_impl(x, w_, sd, pd), w3)(gp)[0]
        err = float(jnp.max(jnp.abs(dwd.astype(jnp.float32)
                                    - dwp.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(dwd.astype(jnp.float32))))
        line = " | ".join(f"{k} {v:6.2f} ms" for k, v in ms.items())
        print(f"block{i + 1} ({cin}->{cout}, sd={sd}): {line} | "
              f"dw max|d|={err:.2e} (scale {scale:.1e})", flush=True)
        din = dout


if __name__ == "__main__":
    main()
