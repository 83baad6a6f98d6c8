"""Single-frame / directory inference CLI.

Capability parity with voxelnet/predict.py:14-76 — load a checkpoint,
voxelize a .bin point cloud, run the detector, print boxes — except the
whole pipeline (voxelization included) is one jitted graph and needs no
labels (the reference had to bypass its own forward for that,
predict.py:58-60).

    python -m voxelnet_tpu.cli.predict --checkpoint path --pcl frame.bin
"""

from __future__ import annotations

import argparse
import glob
import os

if os.environ.get("VOXELNET_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VOXELNET_PLATFORM"])

import jax
import numpy as np

from voxelnet_tpu.config import get_config
from voxelnet_tpu.models.voxelnet import init_params, make_inference_fn
from voxelnet_tpu.ops.voxelize import (VoxelGridSpec, crop_points,
                                       pad_points)
from voxelnet_tpu.training import checkpoint as ckpt_lib
from voxelnet_tpu.utils import kitti


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Orbax checkpoint path (omit for random weights)")
    p.add_argument("--pcl", type=str, required=True,
                   help=".bin file, a directory of .bin files (all are "
                        "processed), or 'sample[:N]' for the N-th "
                        "vendored demo frame (voxelnet_tpu/data/"
                        "sample_frames — no dataset needed)")
    p.add_argument("--class-name", type=str, default="Car")
    p.add_argument("--cfg", type=str, default=None)
    args = p.parse_args(argv)

    config = get_config(args.class_name)
    if args.cfg:
        config = config.merge_from_file(args.cfg)

    if args.checkpoint:
        # accepts a save_single dir, a trainer step dir, or a trainer
        # checkpoints root (latest step)
        variables = ckpt_lib.load_variables(args.checkpoint)
    else:
        variables = init_params(config, jax.random.key(0))

    if args.pcl == "sample" or args.pcl.startswith("sample:"):
        # vendored demo frames — runnable with zero external data
        from voxelnet_tpu.data.sample import sample_frames

        frames = sample_frames()
        if not frames:
            raise SystemExit("no vendored sample frames found")
        i = int(args.pcl.split(":", 1)[1]) if ":" in args.pcl else 0
        if not 0 <= i < len(frames):
            raise SystemExit(
                f"sample index {i} out of range (have {len(frames)})")
        paths = [(f"sample:{i}", frames[i])]
    elif os.path.isdir(args.pcl):
        found = sorted(glob.glob(os.path.join(args.pcl, "*.bin")))
        if not found:
            raise SystemExit(f"no .bin files in {args.pcl!r}")
        paths = [(p, None) for p in found]
    else:
        paths = [(args.pcl, None)]

    infer = jax.jit(make_inference_fn(config))
    rng = np.random.default_rng(0)
    for path, pcl in paths:
        if pcl is None:
            pcl = kitti.read_point_cloud(path)
        if config.data.crop_to_grid:
            # same pre-cap grid crop as the training pipeline
            # (data/dataset.py) — keeps the cap from dropping in-grid
            # points of raw 360-degree scans
            spec = VoxelGridSpec.from_object_config(config.object)
            pcl = crop_points(pcl, spec)
        # uniform subsample on overflow, like the training pipeline
        # (data/dataset.py:119-123) — unshuffled truncation would drop a
        # contiguous azimuth sector of raw uncropped scans
        points, n = pad_points(pcl, config.data.max_points, rng=rng,
                               shuffle=config.data.shuffle_points)
        det = infer(variables, points[None], np.asarray([n], np.int32))
        valid = np.asarray(det.valid[0])
        boxes = np.asarray(det.boxes[0])[valid]
        scores = np.asarray(det.scores[0])[valid]
        print(f"{path}: {valid.sum()} detections")
        for b, s in zip(boxes, scores):
            print(f"  score={s:.4f} box(x,y,z,h,w,l,r)="
                  + " ".join(f"{v:.3f}" for v in b))


if __name__ == "__main__":
    main()
