"""2D convolutional Region Proposal Network.

Same topology as the reference RPN (voxelnet/model.py:202-281): three conv
blocks (strides 2/2/2 for Car; 1/2/2 for Pedestrian/Cyclist) each deconvolved
back to a common (H/2, W/2) map, concatenated to 768 channels, then 1x1
cls/reg heads. TPU-native: NHWC, bfloat16 compute, heads return *logits*
(sigmoid is applied by the caller or folded into the loss).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

import jax

from voxelnet_tpu.models.init import (
    torch_bias_init, torch_deconv_kernel_init, torch_kernel_init)


class _BEVFoldConv(nn.Module):
    """Param-compatible stand-in for ConvBNReLU's nn.Conv that consumes
    the UNFOLDED (B, D, H, W, C) middle output (data.bev_fold='dsplit').

    The c-major depth->BEV fold (models/middle.py, matching the
    reference's NCDHW view at voxelnet/model.py:262) is absorbed into
    the conv: one Conv2D per depth slice with the kernel's input-channel
    axis de-interleaved at trace time (fold channel = c*D + d, so depth
    d's channels sit at kernel[:, :, d::D, :]), summed. Mathematically
    identical to fold-then-Conv2D; the (B, D', H, W, C) -> (B, H, W,
    C*D') transpose (~433 MB/batch8, 5.4 ms fused into block 3 on v5e)
    never materializes. Same 'kernel' (3, 3, D*C, cout) / 'bias' params
    as the nn.Conv it replaces — checkpoints interchange."""

    cout: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        kernel = self.param("kernel", torch_kernel_init,
                            (3, 3, d * c, self.cout), jnp.float32)
        bias = self.param("bias", torch_bias_init(d * c * 9),
                          (self.cout,), jnp.float32)
        y = None
        for dd in range(d):
            wd = kernel[:, :, dd::d, :].astype(self.dtype)
            z = jax.lax.conv_general_dilated(
                x[:, dd].astype(self.dtype), wd,
                window_strides=(self.stride, self.stride),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = z if y is None else y + z
        return y + bias.astype(y.dtype)


class ConvBNReLU(nn.Module):
    cout: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    # eval-time BN folding (models/bn_fold.py): the BN affine lives in
    # the conv kernel/bias — skip the BN op. Ignored when train=True.
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 5:
            # unfolded (B, D, H, W, C) middle output — the depth fold is
            # absorbed into this conv's kernel (see _BEVFoldConv)
            x = _BEVFoldConv(self.cout, self.stride, dtype=self.dtype,
                             name="Conv_0")(x)
        else:
            x = nn.Conv(self.cout, kernel_size=(3, 3),
                        strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(x.shape[-1] * 9),
                        name="Conv_0")(x)
        if not (self.fold_bn and not train):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class DeconvBNReLU(nn.Module):
    cout: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch ConvTranspose2d output size (in-1)*s - 2p + k:
        # (k3, s1, p1) -> same size == flax 'SAME';
        # (k2, s2, p0) / (k4, s4, p0) -> exact in*s == flax 'VALID'.
        padding = "SAME" if self.stride == 1 else "VALID"
        x = nn.ConvTranspose(
            self.cout, kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=padding,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_deconv_kernel_init,
            bias_init=torch_bias_init(
                self.cout * self.kernel * self.kernel))(x)
        if not (self.fold_bn and not train):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class RPN(nn.Module):
    """(B, H, W, 128) BEV -> cls logits (B, H/2, W/2, 2), reg (B, H/2, W/2, 14)."""

    block1_stride: int = 2   # 2 for Car, 1 for Pedestrian/Cyclist
    dtype: jnp.dtype = jnp.bfloat16
    # eval-time BN folding (models/bn_fold.py) for every block
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        fb = self.fold_bn
        # block 1: 5 convs at 128 channels (voxelnet/model.py:213-227)
        x = ConvBNReLU(128, self.block1_stride, dtype=self.dtype,
                       fold_bn=fb)(x, train)
        for _ in range(4):
            x = ConvBNReLU(128, 1, dtype=self.dtype, fold_bn=fb)(x, train)
        up1 = DeconvBNReLU(256, kernel=3, stride=1, dtype=self.dtype,
                           fold_bn=fb)(x, train)

        # block 2: 6 convs at 128 (voxelnet/model.py:231-238)
        x = ConvBNReLU(128, 2, dtype=self.dtype, fold_bn=fb)(x, train)
        for _ in range(5):
            x = ConvBNReLU(128, 1, dtype=self.dtype, fold_bn=fb)(x, train)
        up2 = DeconvBNReLU(256, kernel=2, stride=2, dtype=self.dtype,
                           fold_bn=fb)(x, train)

        # block 3: 6 convs at 256 (voxelnet/model.py:242-249)
        x = ConvBNReLU(256, 2, dtype=self.dtype, fold_bn=fb)(x, train)
        for _ in range(5):
            x = ConvBNReLU(256, 1, dtype=self.dtype, fold_bn=fb)(x, train)
        up3 = DeconvBNReLU(256, kernel=4, stride=4, dtype=self.dtype,
                           fold_bn=fb)(x, train)

        feats = jnp.concatenate([up3, up2, up1], axis=-1)  # 768 channels

        cls_logits = nn.Conv(2, kernel_size=(1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32,
                             kernel_init=torch_kernel_init,
                             bias_init=torch_bias_init(feats.shape[-1]),
                             name="prob_conv")(feats)
        reg = nn.Conv(14, kernel_size=(1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32,
                      kernel_init=torch_kernel_init,
                      bias_init=torch_bias_init(feats.shape[-1]),
                      name="reg_conv")(feats)
        return cls_logits.astype(jnp.float32), reg.astype(jnp.float32)
