from voxelnet_tpu.kernels.voxelize_pallas import build_voxel_table  # noqa: F401
