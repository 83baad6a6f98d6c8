"""Sparse voxel features -> dense (B, D, H, W, C) grid.

Replaces the reference's `torch.sparse.FloatTensor(...).to_dense()`
(voxelnet/model.py:102-106) with a single XLA scatter over a static grid;
padding voxels (count == 0) are routed to an out-of-bounds index and
dropped. Voxel coords are unique per frame so `set` semantics suffice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_to_dense(voxel_features: jnp.ndarray, coords: jnp.ndarray,
                     counts: jnp.ndarray,
                     grid_dzyx: tuple[int, int, int]) -> jnp.ndarray:
    """(B, K, C) + (B, K, 3) zyx coords -> (B, D, H, W, C)."""
    D, H, W = grid_dzyx

    def one(feat, crd, cnt):
        linear = (crd[:, 0] * H + crd[:, 1]) * W + crd[:, 2]
        linear = jnp.where(cnt > 0, linear, D * H * W)  # padding -> dropped
        dense = jnp.zeros((D * H * W, feat.shape[-1]), feat.dtype)
        dense = dense.at[linear].set(feat, mode="drop")
        return dense.reshape(D, H, W, feat.shape[-1])

    return jax.vmap(one)(voxel_features, coords, counts)


def scatter_to_dense_folded(voxel_features: jnp.ndarray,
                            coords: jnp.ndarray, counts: jnp.ndarray,
                            grid_dzyx: tuple[int, int, int]) -> jnp.ndarray:
    """(B, K, C) + (B, K, 3) zyx coords -> (B, H, W, D*C), depth folded
    into channels d-major (channel = d * C + c).

    The layout MiddleLayers(backend='folded2d') consumes: the depth axis
    lives in channels from the start, so the 5D grid and its fold
    transpose never materialize.
    """
    D, H, W = grid_dzyx

    def one(feat, crd, cnt):
        C = feat.shape[-1]
        linear = (crd[:, 1] * W + crd[:, 2]) * D + crd[:, 0]
        linear = jnp.where(cnt > 0, linear, H * W * D)  # padding -> dropped
        dense = jnp.zeros((H * W * D, C), feat.dtype)
        dense = dense.at[linear].set(feat, mode="drop")
        return dense.reshape(H, W, D * C)

    return jax.vmap(one)(voxel_features, coords, counts)
