"""3D convolutional middle layers.

Same topology as the reference middle stack (voxelnet/model.py:206-210,
257-262): three Conv3D+BN+ReLU blocks collapsing the depth axis
10 -> 5 -> 3 -> 2, then a reshape folding (depth, channels) into the BEV
channel axis. TPU-native: NDHWC layout, bfloat16 compute, lowered straight
to XLA convolutions.

Mathematically identical lowerings, selected by `backend`:

  * 'conv3d'   — plain XLA Conv3D over the (B, D, H, W, C) grid.
  * 'folded2d' — the depth axis lives in the channel axis: each Conv3D
    becomes ONE Conv2D whose (3, 3, Din*Cin, Dout*Cout) weight is the
    block-banded expansion of the (3, 3, 3, Cin, Cout) Conv3D weight
    (zeros where |stride*d_out + kd - pad - d_in| says the tap doesn't
    reach). Exact same math, same parameters — checkpoints interchange —
    but the MXU sees contraction dims of 1280/320/192 instead of 128/64,
    and the 5D tensor never materializes. Costs Din/3 x the FLOPs per
    layer; wins only if the utilization gain beats that.
  * 'tap2d'    — Conv3D decomposed into its 3 depth taps:
    Y[:, d'] = sum_kd Conv2D(X[:, s*d' + kd - pad], W[kd]) with (B, D')
    merged into the Conv2D batch. FLOP-neutral (same MAC count as
    conv3d) and every conv is the 3x3 NHWC 128->64 shape XLA already
    tiles well for the RPN — targets the measured Conv3D MFU sink
    without the folded2d multiplier.
  * 'sparse1'  — block 1 computed input-stationarily from the (B, K, C)
    occupied-voxel table (models/sparse_conv.py): one MXU-filling
    (C -> 27*64) matmul + 27 unique-index scatter-adds. Skips 93% of
    block-1's dense FLOPs AND the 128-channel sparse-to-dense scatter
    (the dense grid is never built at C=128 — the first dense tensor is
    block-1's 4x-smaller output). Blocks 2-3 stay XLA Conv3D (after one
    3^3 dilation the occupancy is too dense to win). Input is the
    (voxelwise, coords, counts) tuple, not a dense grid.
  * 'wpack'    — W-paired MXU-filling lowering: every block's 64 output
    channels half-fill the 128-lane MXU, so each Conv3D computes TWO
    adjacent W positions per output row instead — the (3, 3, 3, Cin, 64)
    kernel expands to a zero-padded (3, 3, 4, Cin, 128) kernel applied
    with W-stride 2, and the (.., W/2, 128) result is a row-major
    relabeling of (.., W, 64) (free reshape). Exact same math and
    parameters; 4/3 the MACs at full 128-wide output tiles.
  * 'wpack2'   — wpack that never leaves the paired layout: BatchNorm
    pools the half-lanes (_PairedBatchNorm), ReLU is layout-blind, and
    blocks 2-3 consume the paired tensor directly via a structured
    (3,3,3,2*Cin,2*Cout) kernel (_PPackConv, 2x exact MACs at full
    K/N fill); ONE reshape at the stack exit. Kills the ~19 ms/B8 of
    unpair/repair layout copies the per-block variant pays.

All lowerings share one parameter tree; the winner per stage is measured on
hardware (BASELINE.md MFU ladder) and picked by
models/voxelnet.resolve_middle_backend('auto').
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from voxelnet_tpu.models.init import torch_bias_init, torch_kernel_init

# (cout, depth stride, depth pad) per block — voxelnet/model.py:206-210
_BLOCKS = ((64, 2, 1), (64, 1, 0), (64, 2, 1))


def _fold_depth(din: int, dout: int, stride_d: int, pad_d: int,
                kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) Conv3D weight -> (3, 3, Din*Cin, Dout*Cout)
    block-banded Conv2D weight (channel order d-major both sides)."""
    cin, cout = kernel.shape[3], kernel.shape[4]
    w2 = jnp.zeros((3, 3, din * cin, dout * cout), kernel.dtype)
    for do in range(dout):
        for kd in range(3):
            di = do * stride_d + kd - pad_d
            if 0 <= di < din:
                w2 = w2.at[:, :, di * cin:(di + 1) * cin,
                           do * cout:(do + 1) * cout].set(kernel[kd])
    return w2


class _FoldConv(nn.Module):
    """Param-compatible stand-in for the block's nn.Conv (same 'kernel' /
    'bias' parameters, same shapes/init) computing the depth-folded
    Conv2D lowering. Input (B, H, W, Din*Cin) d-major."""

    cout: int
    cin: int
    din: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        dout = (self.din + 2 * self.pad_d - 3) // self.stride_d + 1
        w2 = _fold_depth(self.din, dout, self.stride_d, self.pad_d, kernel)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w2.astype(self.dtype),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias, dout).astype(y.dtype)


class _TapConv(nn.Module):
    """Param-compatible stand-in for the block's nn.Conv (same 'kernel' /
    'bias') computing Conv3D as 3 depth-tap Conv2Ds over the merged
    (B, Dout) batch. Input/output stay (B, D, H, W, C)."""

    cout: int
    cin: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        b, din, h, w, c = x.shape
        dout = (din + 2 * self.pad_d - 3) // self.stride_d + 1
        xp = jnp.pad(x, ((0, 0), (self.pad_d, self.pad_d), (0, 0),
                         (0, 0), (0, 0))).astype(self.dtype)
        y = None
        for kd in range(3):
            lo = kd
            hi = kd + self.stride_d * (dout - 1) + 1
            sl = xp[:, lo:hi:self.stride_d]          # (B, Dout, H, W, C)
            z = jax.lax.conv_general_dilated(
                sl.reshape(b * dout, h, w, c),
                kernel[kd].astype(self.dtype),
                window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = z if y is None else y + z
        y = y + bias.astype(y.dtype)
        return y.reshape(b, dout, h, w, self.cout)


def _conv3d_raw(x, w3, stride_d, pad_d):
    return jax.lax.conv_general_dilated(
        x, w3, window_strides=(stride_d, 1, 1),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _wpack_impl(x, w3, stride_d, pad_d):
    """Paired-layout output (B, D', H, W/2, 2*Cout) — a row-major
    relabeling of (B, D', H, W, Cout); the caller reshapes AFTER the
    bias add so the broadcast stays 128-lane-wide (measured: adding the
    64-wide bias on the reshaped view costs ~8 f/s of the full graph —
    XLA picks a worse layout for the 64-minor intermediate)."""
    cin, cout = w3.shape[3], w3.shape[4]
    v = jnp.zeros((3, 3, 4, cin, 2 * cout), w3.dtype)
    for kw in range(3):
        v = v.at[:, :, kw, :, :cout].set(w3[:, :, kw])
        v = v.at[:, :, kw + 1, :, cout:].set(w3[:, :, kw])
    return jax.lax.conv_general_dilated(
        x, v, window_strides=(stride_d, 1, 2),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _wpack_conv3d(x, w3, stride_d, pad_d):
    """W-paired Conv3D with a measured-per-piece VJP. Forward runs the
    MXU-filling paired lowering (fastest, BASELINE.md). Backward picks
    each transpose's formulation by measurement (probe_wpack_bwd.py,
    v5e B8): grad-input uses the PAIRED transpose everywhere (its
    128-channel cotangent keeps the transposed conv full-width — 21.5
    vs 32.9 ms on block 1); grad-weight uses the paired correlation for
    the 64-in blocks (11.8 vs 16.7 ms) but the DENSE one for the
    128-in block (28.2 vs 32.1 — the wider contraction already fills
    the MXU and the paired form's extra MACs lose). All formulations
    compute the same math; f32 grads agree to rounding, bf16 to
    summation-order ulp. Output is the paired (B, D', H, W/2, 2*Cout)
    layout."""
    return _wpack_impl(x, w3, stride_d, pad_d)


def _wpack_fwd(x, w3, stride_d, pad_d):
    return _wpack_impl(x, w3, stride_d, pad_d), (x, w3)


def _wpack_bwd(stride_d, pad_d, res, g):
    x, w3 = res
    cin, cout = w3.shape[3], w3.shape[4]
    dx = jax.linear_transpose(
        lambda x_: _wpack_impl(x_, w3, stride_d, pad_d), x)(g)[0]
    if cin > cout:
        # dense grad-weight: the paired cotangent is a free relabeling
        g64 = g.reshape(g.shape[:3] + (2 * g.shape[3], cout))
        dw = jax.linear_transpose(
            lambda w_: _conv3d_raw(x, w_, stride_d, pad_d), w3)(g64)[0]
    else:
        dw = jax.linear_transpose(
            lambda w_: _wpack_impl(x, w_, stride_d, pad_d), w3)(g)[0]
    return dx, dw


_wpack_conv3d.defvjp(_wpack_fwd, _wpack_bwd)


class _WPackConv(nn.Module):
    """Param-compatible stand-in for the block's nn.Conv (same 'kernel' /
    'bias' parameters, shapes, init) computing the W-paired lowering:
    the size-4 W window starting at 2u-1 covers both output w=2u (taps
    at window positions 0..2) and w=2u+1 (taps at positions 1..3), so a
    (3, 3, 4, Cin, 2*Cout) zero-padded kernel at W-stride 2 emits both
    as one 128-wide channel block — full MXU width at 4/3 the MACs.
    The (.., W/2, 2*Cout) result is a row-major relabeling of
    (.., W, Cout), so the closing reshape is free. Input/output stay
    (B, D, H, W, C); backward is the dense conv3d VJP (_wpack_conv3d)."""

    cout: int
    cin: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16
    # where the bias broadcast happens relative to the free reshape —
    # measured to steer XLA's layout choice for the conv output
    # OPPOSITE ways in the two graphs (BASELINE.md): paired-side wins
    # inference (110.1 vs 102.3 f/s @B24), reshaped-side wins training
    # (34.1 vs 31.3 f/s @B8); ConvBlock3D passes paired_bias=not train
    paired_bias: bool = True
    # wpack2: return the paired (.., W/2, 2*Cout) tensor itself — the
    # consumer stays in paired space (_PPackConv / _PairedBatchNorm)
    paired_out: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        w = x.shape[3]
        if w % 2:
            raise ValueError(f"wpack needs an even W (got {w})")
        y = _wpack_conv3d(x.astype(self.dtype), kernel.astype(self.dtype),
                          self.stride_d, self.pad_d)
        if self.paired_out:
            return y + jnp.tile(bias, 2).astype(y.dtype)
        if self.paired_bias:
            y = y + jnp.tile(bias, 2).astype(y.dtype)
            return y.reshape(y.shape[:3] + (w, self.cout))
        y = y.reshape(y.shape[:3] + (w, self.cout))
        return y + bias.astype(y.dtype)


def _ppack_kernel(w3: jnp.ndarray) -> jnp.ndarray:
    """(3,3,3,Cin,Cout) -> (3,3,3,2*Cin,2*Cout) paired-in/paired-out
    W kernel: input pair u carries (X[2u] | X[2u+1]) in channels, the
    output pair likewise, so the W conv becomes a stride-1 size-3 conv
    over pairs with half-block-structured taps. 2x the exact MACs at
    full K/N MXU fill — the price of never leaving the paired layout."""
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


class _PPackConv(nn.Module):
    """Param-compatible stand-in for the block's nn.Conv computing the
    paired-in/paired-out lowering: input AND output stay in the paired
    (B, D, H, W/2, 2*C) layout (backend='wpack2'). Same 'kernel'/'bias'
    parameters, shapes, init as the conv3d backend."""

    cout: int
    cin: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xp):
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        v = _ppack_kernel(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), v,
            window_strides=(self.stride_d, 1, 1),
            padding=((self.pad_d, self.pad_d), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + jnp.tile(bias, 2).astype(y.dtype)


class _PairedBatchNorm(nn.Module):
    """Param-compatible stand-in for the block's nn.BatchNorm operating
    on the paired (.., W/2, 2*C) layout: per-C statistics pool the two
    half-lanes (exactly the stats BatchNorm computes over (B, D, H, W)),
    the affine applies tiled — the big tensor never unpacks. Same
    'scale'/'bias' params and 'mean'/'var' batch_stats, flax momentum
    semantics (mirrors _FoldBatchNorm)."""

    cout: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xp, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones,
                           (self.cout,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.cout,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.cout,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.cout,), jnp.float32))
        xf = xp.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m2 = xf.mean(axis=tuple(range(xf.ndim - 1)))       # (2C,)
            e2 = (xf * xf).mean(axis=tuple(range(xf.ndim - 1)))
            mean = 0.5 * (m2[:self.cout] + m2[self.cout:])
            var = 0.5 * (e2[:self.cout] + e2[self.cout:]) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (xf - jnp.tile(mean, 2)) * jnp.tile(inv, 2) + jnp.tile(
            bias, 2)


class _SparseConv(nn.Module):
    """Param-compatible stand-in for block-1's nn.Conv (same 'kernel' /
    'bias' parameters, shapes, init) computing the conv sparsely from
    the (voxelwise, coords, counts) table — models/sparse_conv.py.
    Output is the dense (B, Dout, H, W, Cout) grid block 2 consumes."""

    cout: int
    cin: int
    stride_d: int
    pad_d: int
    grid_dzyx: tuple[int, int, int] = (0, 0, 0)
    dtype: jnp.dtype = jnp.bfloat16
    # spatial sharding: partition the output W axis over `num_model`
    # 'model' shards via shard_map (sparse_conv3x3_sharded); 1 = off
    num_model: int = 1

    @nn.compact
    def __call__(self, feat, coords, counts):
        from voxelnet_tpu.models.sparse_conv import (sparse_conv3x3,
                                                     sparse_conv3x3_sharded)

        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        if self.num_model > 1:
            return sparse_conv3x3_sharded(
                feat.astype(self.dtype), coords, counts, kernel, bias,
                self.grid_dzyx, self.stride_d, self.pad_d,
                num_model=self.num_model)
        return sparse_conv3x3(feat.astype(self.dtype), coords, counts,
                              kernel, bias, self.grid_dzyx,
                              self.stride_d, self.pad_d)


class _SparseBwdConv(nn.Module):
    """Param-compatible stand-in for block-1's nn.Conv computing the
    dense forward (scatter + XLA Conv3D — the measured-fastest forward)
    with the sparse custom-VJP backward of
    models/sparse_conv.conv3x3_sparsebwd: grad-input/grad-weight come
    from 9 slice-gathers of the output cotangent at the K occupied
    sites + two MXU matmuls instead of the dense transposed-conv pair.
    Exact same parameters, shapes, init as the conv3d backend."""

    cout: int
    cin: int
    stride_d: int
    pad_d: int
    grid_dzyx: tuple[int, int, int] = (0, 0, 0)
    dtype: jnp.dtype = jnp.bfloat16
    scatter_hints: bool = False

    @nn.compact
    def __call__(self, feat, coords, counts):
        from voxelnet_tpu.models.sparse_conv import conv3x3_sparsebwd

        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, 3, self.cin, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(self.cin * 27),
                          (self.cout,), jnp.float32)
        return conv3x3_sparsebwd(feat.astype(self.dtype), coords, counts,
                                 kernel, bias, self.grid_dzyx,
                                 self.stride_d, self.pad_d,
                                 self.scatter_hints)


class _FoldBatchNorm(nn.Module):
    """Param-compatible stand-in for the block's nn.BatchNorm: per-C
    statistics shared across the depth slices folded into the channel
    axis (what BatchNorm3d computes over (B, D, H, W)). Same 'scale' /
    'bias' params and 'mean'/'var' batch_stats, flax momentum semantics."""

    cout: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        scale = self.param("scale", nn.initializers.ones,
                           (self.cout,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.cout,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.cout,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.cout,), jnp.float32))
        b, h, w, _ = x.shape
        xr = x.reshape(b, h, w, -1, self.cout).astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = xr.mean(axis=(0, 1, 2, 3))
            var = (xr * xr).mean(axis=(0, 1, 2, 3)) - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        y = (xr - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.reshape(b, h, w, -1)


class ConvBlock3D(nn.Module):
    cout: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16
    backend: str = "conv3d"
    # folded2d lowering: din is static (channel axis carries Din*Cin)
    din: int = 0
    # sparse1 lowering: the static dense grid the sparse conv writes
    grid_dzyx: tuple[int, int, int] = (0, 0, 0)
    # sparse1 spatial sharding: 'model' shards of the output W axis
    num_model: int = 1
    # sparsebwd lowering: XLA scatter hints for its in-forward dense build
    scatter_hints: bool = False
    # wpack2 lowering: the block's input is already in the paired
    # (.., W/2, 2*C) layout (blocks 2-3)
    paired_in: bool = False
    # eval-time BN folding: the BN affine lives in the conv kernel/bias
    # (models/bn_fold.fold_bn_variables) — skip the BN op entirely.
    # Ignored when train=True (training needs live batch statistics).
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip_bn = self.fold_bn and not train
        if self.backend == "wpack2":
            # paired-throughout: the activation never leaves the paired
            # (.., W/2, 2*C) layout — BN pools the half-lanes, the next
            # block consumes the paired tensor directly (_PPackConv)
            if self.paired_in:
                x = _PPackConv(self.cout, x.shape[-1] // 2, self.stride_d,
                               self.pad_d, dtype=self.dtype,
                               name="Conv_0")(x)
            else:
                x = _WPackConv(self.cout, x.shape[-1], self.stride_d,
                               self.pad_d, dtype=self.dtype,
                               paired_out=True, name="Conv_0")(x)
            if not skip_bn:
                x = _PairedBatchNorm(self.cout, name="BatchNorm_0")(
                    x, use_running_average=not train)
            return nn.relu(x).astype(self.dtype)
        if self.backend == "sparsebwd":
            feat, coords, counts = x
            x = _SparseBwdConv(self.cout, feat.shape[-1], self.stride_d,
                               self.pad_d, grid_dzyx=self.grid_dzyx,
                               dtype=self.dtype,
                               scatter_hints=self.scatter_hints,
                               name="Conv_0")(feat, coords, counts)
        elif self.backend == "sparse1":
            feat, coords, counts = x
            x = _SparseConv(self.cout, feat.shape[-1], self.stride_d,
                            self.pad_d, grid_dzyx=self.grid_dzyx,
                            dtype=self.dtype, num_model=self.num_model,
                            name="Conv_0")(feat, coords, counts)
        elif self.backend == "folded2d":
            cin = x.shape[-1] // self.din
            x = _FoldConv(self.cout, cin, self.din, self.stride_d,
                          self.pad_d, dtype=self.dtype, name="Conv_0")(x)
            if not skip_bn:
                x = _FoldBatchNorm(self.cout, name="BatchNorm_0")(
                    x, use_running_average=not train)
            return nn.relu(x).astype(self.dtype)
        elif self.backend == "tap2d":
            x = _TapConv(self.cout, x.shape[-1], self.stride_d,
                         self.pad_d, dtype=self.dtype, name="Conv_0")(x)
        elif self.backend == "wpack":
            x = _WPackConv(self.cout, x.shape[-1], self.stride_d,
                           self.pad_d, dtype=self.dtype,
                           paired_bias=not train, name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.cout, kernel_size=(3, 3, 3),
                strides=(self.stride_d, 1, 1),
                padding=((self.pad_d, self.pad_d), (1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=torch_kernel_init,
                bias_init=torch_bias_init(x.shape[-1] * 27),
            )(x)
        if not skip_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name="BatchNorm_0")(x)
        return nn.relu(x).astype(self.dtype)


def _depth_out(din: int, stride_d: int, pad_d: int) -> int:
    return (din + 2 * pad_d - 3) // stride_d + 1


class MiddleLayers(nn.Module):
    """conv3d: (B, D, H, W, C) -> (B, H, W, D' * 64) BEV features.
    folded2d: (B, H, W, D*C) d-major (scatter_to_dense_folded) -> same.

    Conv depth strides/pads (2,1)/(1,0)/(2,1) collapse D=10 to 2, matching
    voxelnet/model.py:206-210; channels 128 -> 64 -> 64 -> 64. Both
    backends share one parameter tree (checkpoints interchange).
    """

    dtype: jnp.dtype = jnp.bfloat16
    backend: str = "conv3d"
    # folded2d with a 4D (B, H, W, D*C) input needs the static D
    depth_in: int = 0
    # sparse1 (voxel-table input) needs the full static (H, W) too
    grid_hw: tuple[int, int] = (0, 0)
    # sparse1 spatial sharding of the output W axis ('model' shards)
    num_model: int = 1
    # sparsebwd: scatter hints for block-1's in-forward dense build
    scatter_hints: bool = False
    # fold=False returns the raw (B, D', H, W, C) block-3 output; the
    # consumer (rpn._BEVFoldConv) absorbs the c-major depth fold into
    # its first conv's kernel, so the ~433 MB/batch8 fold transpose
    # never materializes (data.bev_fold='dsplit'). conv3d-family
    # backends only — folded2d's activations are already folded.
    fold: bool = True
    # eval-time BN folding (models/bn_fold.py): skip every BN op; the
    # affine lives in the (transformed) conv params. Eval graphs only.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backend in ("sparse1", "sparsebwd"):
            # x is the (voxelwise (B,K,C), coords, counts) tuple — block 1
            # runs off the voxel table (sparse compute for sparse1, dense
            # forward + sparse backward for sparsebwd); its dense output
            # feeds blocks 2-3 as plain conv3d
            if self.depth_in <= 0 or min(self.grid_hw) <= 0:
                raise ValueError(
                    f"MiddleLayers(backend={self.backend!r}) needs "
                    "depth_in and grid_hw (the static grid D, H, W)")
            feat, _, _ = x
            b = feat.shape[0]
            h, w = self.grid_hw
            din = self.depth_in
            cout, stride_d, pad_d = _BLOCKS[0]
            x = ConvBlock3D(cout, stride_d, pad_d, dtype=self.dtype,
                            backend=self.backend,
                            grid_dzyx=(din, h, w),
                            scatter_hints=self.scatter_hints,
                            num_model=self.num_model,
                            fold_bn=self.fold_bn)(x, train)
            for cout, stride_d, pad_d in _BLOCKS[1:]:
                x = ConvBlock3D(cout, stride_d, pad_d, dtype=self.dtype,
                                backend="conv3d",
                                fold_bn=self.fold_bn)(x, train)
            if not self.fold:
                return x
            x = x.transpose(0, 2, 3, 4, 1)
            return x.reshape(b, h, w, -1)
        if self.backend == "folded2d":
            if not self.fold:
                raise ValueError(
                    "MiddleLayers(fold=False) needs a 5D-output backend; "
                    "folded2d activations are already depth-folded")
            if x.ndim == 5:  # accept the 5D layout too; fold it here
                b, d, h, w, c = x.shape
                x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
                din = d
            else:
                if self.depth_in <= 0:
                    raise ValueError(
                        "MiddleLayers(backend='folded2d') with a 4D input "
                        "needs depth_in (the static grid D)")
                din = self.depth_in
            b, h, w, _ = x.shape
            for cout, stride_d, pad_d in _BLOCKS:
                x = ConvBlock3D(cout, stride_d, pad_d, dtype=self.dtype,
                                backend="folded2d", din=din,
                                fold_bn=self.fold_bn)(x, train)
                din = _depth_out(din, stride_d, pad_d)
            # reorder the (d, c) channel fold to the reference's c-major
            # BEV layout (voxelnet/model.py:262): bev_channel = c*D' + d
            x = x.reshape(b, h, w, din, -1).transpose(0, 1, 2, 4, 3)
            return x.reshape(b, h, w, -1)

        b, _, h, w, _ = x.shape
        if self.backend == "wpack2":
            # paired-throughout: one unpair reshape at the very end
            for i, (cout, stride_d, pad_d) in enumerate(_BLOCKS):
                x = ConvBlock3D(cout, stride_d, pad_d, dtype=self.dtype,
                                backend="wpack2", paired_in=i > 0,
                                fold_bn=self.fold_bn)(x, train)
            x = x.reshape(x.shape[:3] + (w, -1))
        else:
            for cout, stride_d, pad_d in _BLOCKS:
                x = ConvBlock3D(cout, stride_d, pad_d, dtype=self.dtype,
                                backend=self.backend,
                                fold_bn=self.fold_bn)(x, train)
        if not self.fold:
            return x
        # fold remaining depth into channels: (B, D', H, W, C) ->
        # (B, H, W, C*D') with the CHANNEL axis major, matching the
        # reference's view of its NCDHW tensor (voxelnet/model.py:262
        # merges adjacent (C, D') dims, i.e. bev_channel = c*D' + d).
        # Keeping the same fold order makes checkpoints weight-level
        # compatible across frameworks (scripts/ab_transplant.py).
        x = x.transpose(0, 2, 3, 4, 1)
        return x.reshape(b, h, w, -1)
