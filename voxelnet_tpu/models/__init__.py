from voxelnet_tpu.models.voxelnet import VoxelNet  # noqa: F401
