"""voxelnet_tpu — a TPU-native VoxelNet framework (JAX / XLA / Pallas / pjit).

Brand-new implementation of the capabilities of the PyTorch reference
(`johanngerberding/voxelnet-pytorch`): KITTI LiDAR 3D object detection with
voxel feature encoding, 3D conv middle layers and a 2D conv RPN — redesigned
TPU-first:

  * static-shape, on-device voxelization (point -> voxel scatter with
    per-voxel point caps and padding masks), with a Pallas kernel path
  * a fused VFE stack (per-point MLP + masked voxel max-pool + concat)
  * sparse->dense scatter + 3D/2D convolutions lowered to XLA
  * on-device anchor decode, target assignment, rotated NMS — inference is a
    single jitted graph
  * data-parallel training over a `jax.sharding.Mesh` via NamedSharding
  * Orbax checkpointing with real resume

See SURVEY.md for the structural map of the reference this was built from.
"""

__version__ = "0.1.0"

from voxelnet_tpu.config import VoxelNetConfig, get_config  # noqa: F401
