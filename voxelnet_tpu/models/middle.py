"""3D convolutional middle layers.

Same topology as the reference middle stack (voxelnet/model.py:206-210,
257-262): three Conv3D+BN+ReLU blocks collapsing the depth axis
10 -> 5 -> 3 -> 2, then a reshape folding (depth, channels) into the BEV
channel axis. TPU-native: NDHWC layout, bfloat16 compute, lowered straight
to XLA convolutions.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from voxelnet_tpu.models.init import torch_bias_init, torch_kernel_init


class ConvBlock3D(nn.Module):
    cout: int
    stride_d: int
    pad_d: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.cout, kernel_size=(3, 3, 3),
            strides=(self.stride_d, 1, 1),
            padding=((self.pad_d, self.pad_d), (1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(x.shape[-1] * 27),
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


class MiddleLayers(nn.Module):
    """(B, D, H, W, C) -> (B, H, W, D' * 64) BEV features.

    Conv depth strides/pads (2,1)/(1,0)/(2,1) collapse D=10 to 2, matching
    voxelnet/model.py:206-210; channels 128 -> 64 -> 64 -> 64.
    """

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, _, h, w, _ = x.shape
        x = ConvBlock3D(64, stride_d=2, pad_d=1, dtype=self.dtype)(x, train)
        x = ConvBlock3D(64, stride_d=1, pad_d=0, dtype=self.dtype)(x, train)
        x = ConvBlock3D(64, stride_d=2, pad_d=1, dtype=self.dtype)(x, train)
        # fold remaining depth into channels: (B, D', H, W, C) ->
        # (B, H, W, C*D') with the CHANNEL axis major, matching the
        # reference's view of its NCDHW tensor (voxelnet/model.py:262
        # merges adjacent (C, D') dims, i.e. bev_channel = c*D' + d).
        # Keeping the same fold order makes checkpoints weight-level
        # compatible across frameworks (scripts/ab_transplant.py).
        x = x.transpose(0, 2, 3, 4, 1)
        return x.reshape(b, h, w, -1)
