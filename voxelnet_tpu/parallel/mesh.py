"""Device mesh + sharding helpers.

The reference is strictly single-process / single-GPU (voxelnet/train.py:48-49;
its NUM_GPUS knob is never read — SURVEY.md §1). Here parallelism is a
first-class axis from day one: a 2D ('data', 'model') mesh where

  * 'data'  — batch (data-parallel) axis; gradients reduce over ICI via the
    collectives XLA inserts for sharded-batch jit.
  * 'model' — spatial/model axis; the dense BEV grid can be sharded along W
    (this conv detector's analog of tensor/context parallelism: XLA inserts
    halo exchanges for the convolution edges — SURVEY.md §5).

A mesh of size 1 on either axis is free, so every train/infer graph is built
against the mesh unconditionally.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: int | None = None, num_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data is None:
        num_data = n // num_model
    need = num_data * num_model
    if need > n:
        raise ValueError(f"mesh {num_data}x{num_model} needs {need} devices,"
                         f" have {n}")
    arr = np.asarray(devices[:need]).reshape(num_data, num_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put the array leaves of a batch with batch-axis sharding."""
    sharding = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and np.ndim(v) >= 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = v
    return out


