from voxelnet_tpu.data.dataset import KITTIDataset, make_batch_iterator  # noqa: F401
