from voxelnet_tpu.utils import geometry, kitti  # noqa: F401
