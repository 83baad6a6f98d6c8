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


_AMBIENT_MESH_WARNED = False


def execution_platform(mesh=None, platform: str | None = None) -> str:
    """Platform ('tpu' | 'cpu' | ...) of the devices that will EXECUTE.

    Backend-dependent choices (Pallas interpret mode, measured-winner
    lowerings) must key off the devices a graph actually runs on — not
    `jax.default_backend()`, which is a process-global that can disagree
    with the mesh in play (e.g. a TPU plugin is registered but the mesh
    is built from CPU fallback devices, as the driver's
    `dryrun_multichip` does; or a CPU side-job runs next to the exclusive
    chip). Priority:

      1. explicit `platform` argument,
      2. the devices of an explicit `mesh` argument,
      3. the ambient concrete mesh (`jax.set_mesh(...)` context),
      4. `jax.default_backend()` (single-device default placement).
    """
    if platform is not None:
        return platform
    if mesh is not None:
        devs = getattr(mesh, "devices", None)
        if devs is not None and getattr(devs, "size", 0):
            return devs.flat[0].platform
    try:
        from jax._src import mesh as _mesh_lib

        concrete = _mesh_lib.get_concrete_mesh()
        devs = getattr(concrete, "devices", None)
        # the empty Mesh() outside any set_mesh context carries an object
        # array holding None — that's the normal priority-4 fall-through,
        # not version drift
        if (devs is not None and getattr(devs, "size", 0)
                and devs.flat[0] is not None):
            return devs.flat[0].platform
    except (ImportError, AttributeError):  # pragma: no cover
        # Private-API drift: silently ignoring a broad failure here would
        # reintroduce the r03 escape (non-interpret Pallas compiled for a
        # CPU mesh under a registered TPU plugin), so only the two
        # module-shape errors are tolerated — and loudly, once.
        global _AMBIENT_MESH_WARNED
        if not _AMBIENT_MESH_WARNED:
            _AMBIENT_MESH_WARNED = True
            import warnings

            warnings.warn(
                "jax._src.mesh.get_concrete_mesh unavailable (JAX version "
                "drift); execution_platform falls back to "
                "jax.default_backend(), which may disagree with an ambient "
                "jax.set_mesh(...) context. Pass mesh= explicitly.",
                RuntimeWarning, stacklevel=2)
    return jax.default_backend()


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


