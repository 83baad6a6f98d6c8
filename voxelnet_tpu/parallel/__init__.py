from voxelnet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    execution_platform,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
