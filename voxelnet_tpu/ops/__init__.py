from voxelnet_tpu.ops import (  # noqa: F401
    anchors,
    box_coding,
    iou,
    losses,
    nms,
    targets,
    voxelize,
)
