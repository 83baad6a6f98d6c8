"""Voxel Feature Encoding (VFE) stack.

Capability parity with the reference VFE layers + feature-learning net
(voxelnet/model.py:60-108): per-point Dense -> ReLU -> BatchNorm, masked
voxel max-pool, pointwise-concat, final voxel max. TPU redesign notes:

  * fixed (B, K, T, C) buffers — the point mask carries the raggedness.
  * BatchNorm is mask-aware by default (the reference normalizes over padded
    points too, voxelnet/model.py:74-76; `bn_over_padding=True` reproduces
    that for parity checks).
  * per-point Dense layers are (B*K*T, C) matmuls — MXU-shaped; compute in
    `dtype` (bfloat16 by default), params in float32.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from voxelnet_tpu.models.init import torch_bias_init, torch_kernel_init


class VFELayer(nn.Module):
    """One VFE block: Dense(cin -> cout/2), ReLU, BN, masked max, concat."""

    cout: int
    dtype: jnp.dtype = jnp.bfloat16
    bn_over_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """x: (B, K, T, cin); mask: (B, K, T) bool. Returns (B, K, T, cout)."""
        half = self.cout // 2
        y = nn.Dense(half, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(x.shape[-1]),
                     name="fcn")(x.astype(self.dtype))
        y = nn.relu(y)

        bn_mask = None if self.bn_over_padding else mask[..., None]
        y = nn.BatchNorm(
            use_running_average=not train,
            axis=-1, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(y, mask=bn_mask).astype(self.dtype)

        if self.bn_over_padding:
            # reference parity: the max-pool sees the ghost activations the
            # padded zero-rows produce (voxelnet/model.py:77)
            agg = y.max(axis=2, keepdims=True)
        else:
            neg = jnp.asarray(-1e9, self.dtype)
            agg = jnp.where(mask[..., None], y, neg).max(axis=2,
                                                         keepdims=True)
        agg = jnp.broadcast_to(agg, y.shape)                  # (B, K, 1->T, half)
        out = jnp.concatenate([y, agg], axis=-1)              # (B, K, T, cout)
        return out * mask[..., None].astype(self.dtype)


class FeatureLearningNet(nn.Module):
    """VFE(7->32) -> VFE(32->128) -> masked voxel max -> (B, K, 128).

    Equivalent role to voxelnet/model.py:85-108 minus the sparse-to-dense
    scatter (that lives in models/scatter.py so it can fuse with the middle
    convs under jit).
    """

    dtype: jnp.dtype = jnp.bfloat16
    bn_over_padding: bool = False

    @nn.compact
    def __call__(self, features: jnp.ndarray, counts: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """features: (B, K, T, 7); counts: (B, K). Returns (B, K, 128)."""
        T = features.shape[2]
        point_mask = (
            jnp.arange(T, dtype=jnp.int32)[None, None, :]
            < counts[:, :, None]
        )
        x = VFELayer(32, dtype=self.dtype,
                     bn_over_padding=self.bn_over_padding,
                     name="vfe1")(features, point_mask, train)
        x = VFELayer(128, dtype=self.dtype,
                     bn_over_padding=self.bn_over_padding,
                     name="vfe2")(x, point_mask, train)
        if self.bn_over_padding:
            # reference parity: x is zero at padded rows and the max runs
            # over them too, clamping each channel at >= 0
            # (voxelnet/model.py:100)
            voxelwise = x.max(axis=2)
        else:
            neg = jnp.asarray(-1e9, self.dtype)
            voxelwise = jnp.where(point_mask[..., None], x, neg).max(axis=2)
        # empty (padding) voxels contribute zeros to the dense grid
        voxel_mask = (counts > 0)[..., None].astype(self.dtype)
        return voxelwise * voxel_mask
