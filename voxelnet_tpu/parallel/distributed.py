"""Multi-host (multi-process) distribution.

The reference is strictly single-process/single-GPU — no torch.distributed,
NCCL or MPI anywhere (SURVEY.md §2 language note; voxelnet/train.py:48-49).
The TPU-native multi-host story built here:

  * `initialize()` — `jax.distributed.initialize` entry point (coordinator
    address + process count/id from args or the standard env vars), making
    every process see the global device set.
  * `make_multihost_mesh()` — a ('dcn', 'data', 'model') mesh with DCN
    MAJOR and ICI minor: the 'dcn' axis strides across processes (slices),
    'data'/'model' stay within a slice, so the per-step gradient reduction
    decomposes into fast ICI all-reduces within each slice plus one small
    cross-slice DCN reduction — XLA inserts exactly that given this device
    order (the scaling-book recipe: mesh axes ordered dcn x ici).
  * `stage_global_batch()` — per-host data loading: each process feeds only
    its local shard and `jax.make_array_from_process_local_data` assembles
    the logically-global batch without any cross-host data movement.

Batches shard over ('dcn', 'data') jointly; the 'model' axis carries the
spatial W-sharding (models/voxelnet.py). Works identically for a
single-process mesh (dcn axis of size 1 is free).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Start the JAX distributed runtime for multi-host execution.

    Arguments default to the VOXELNET_COORDINATOR / VOXELNET_NUM_PROCESSES /
    VOXELNET_PROCESS_ID environment variables, so launchers can configure
    workers without code changes. No-op (with a warning) if already
    initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "VOXELNET_COORDINATOR")
    if num_processes is None and "VOXELNET_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VOXELNET_NUM_PROCESSES"])
    if process_id is None and "VOXELNET_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VOXELNET_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_multihost_mesh(num_dcn: int | None = None,
                        num_data: int | None = None,
                        num_model: int = 1,
                        devices=None) -> Mesh:
    """('dcn', 'data', 'model') mesh, DCN major / ICI minor.

    num_dcn defaults to the process count (one slice per host); num_data
    defaults to local_devices_per_slice // num_model. Devices are ordered
    so each (data, model) sub-grid is process-local: collectives over
    'data'/'model' ride ICI, only the 'dcn' axis crosses hosts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_dcn is None:
        num_dcn = jax.process_count()
    per_slice = len(devices) // num_dcn
    if num_data is None:
        num_data = per_slice // num_model
    need = num_dcn * num_data * num_model
    if need > len(devices):
        raise ValueError(
            f"mesh {num_dcn}x{num_data}x{num_model} needs {need} devices, "
            f"have {len(devices)}")

    # group devices by process so the trailing (ICI) axes stay intra-host;
    # jax.devices() is already process-major, but sort defensively
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices[:need]).reshape(num_dcn, num_data, num_model)
    n_proc = jax.process_count()
    if n_proc > 1:
        owners = {d.process_index for d in arr.ravel()}
        if len(owners) != n_proc:
            # a process with no mesh devices deadlocks the first collective
            raise ValueError(
                f"mesh {num_dcn}x{num_data}x{num_model} covers devices of "
                f"{len(owners)}/{n_proc} processes; every process must own "
                f"mesh devices (got processes {sorted(owners)})")
    return Mesh(arr, ("dcn", "data", "model"))


def global_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the joint ('dcn', 'data') axes."""
    return NamedSharding(mesh, P(("dcn", "data")))


def local_rows(x) -> np.ndarray:
    """Extract THIS process's batch rows from a batch-sharded global array
    (inverse of stage_global_batch for one entry) — used by host-side
    consumers (label dumps, viz) that operate per-host.

    Arrays replicated (or sharded on non-batch axes) over the 'model'
    axis expose one addressable shard PER DEVICE: several shards then
    cover the same batch rows (and possibly partial trailing axes).
    Deduplicate by batch-row index and take each row block's
    full-trailing-extent shard, else dumps would interleave duplicate or
    partial rows and attribute predictions to the wrong frame."""
    by_start: dict = {}
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if tuple(s.data.shape[1:]) == tuple(x.shape[1:]):
            by_start.setdefault(start, s)   # one copy per row block
    if by_start:
        return np.concatenate(
            [np.asarray(by_start[k].data) for k in sorted(by_start)],
            axis=0)
    # trailing axes are themselves sharded (e.g. W-sharded maps):
    # assemble each row block from its addressable shards' index slices —
    # np.asarray(global) would raise in a real multi-process run (the
    # jax.Array spans non-addressable devices)
    blocks = sorted({(s.index[0].start or 0,
                      x.shape[0] if s.index[0].stop is None
                      else s.index[0].stop)
                     for s in x.addressable_shards})
    out = []
    for a, b in blocks:
        buf = np.zeros((b - a, *x.shape[1:]), x.dtype)
        covered = np.zeros(x.shape[1:], bool)
        for s in x.addressable_shards:
            if (s.index[0].start or 0) != a:
                continue
            trail = tuple(slice(i.start, i.stop) for i in s.index[1:])
            buf[(slice(None), *trail)] = np.asarray(s.data)
            covered[trail] = True
        if not covered.all():
            # a mesh whose trailing-axis shards span processes would
            # leave silent zero-filled columns here — fail instead
            raise ValueError(
                "local_rows: this process's shards do not cover the "
                f"trailing axes of batch rows [{a}:{b}) (non-addressable "
                "trailing shards); gather globally instead")
        out.append(buf)
    return np.concatenate(out, axis=0)


def stage_global_batch(mesh: Mesh, local_batch: dict,
                       global_batch_size: int | None = None) -> dict:
    """Assemble per-process local batches into global sharded arrays.

    Each process passes only ITS batch rows (global_batch_size // process
    count of them). Non-array entries (tags, label lines, counters) pass
    through untouched and stay process-local.
    """
    sharding = global_batch_sharding(mesh)
    n_proc = jax.process_count()
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, (np.ndarray, jax.Array)) and np.ndim(v) >= 1:
            global_shape = ((global_batch_size or v.shape[0] * n_proc),
                            *v.shape[1:])
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v), global_shape)
        else:
            out[k] = v
    return out
