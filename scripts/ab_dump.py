"""Dump val predictions from a framework (Orbax) checkpoint at an
arbitrary score threshold.

The equal-step A/B trains are dumped by cli.train at the config's
operating threshold (rpn.score_thres 0.25); on the de-leaked split both
stacks' few-epoch logits sit below it, making the epoch-8 AP table
all-zero on both sides. This driver re-dumps any epoch's checkpoint at a
lower threshold so the undertrained-regime AP comparison has content
(the torch twin is `ab_torch_train.py --dump-only --score-thres`).

    VOXELNET_PLATFORM=cpu python scripts/ab_dump.py \
        --checkpoint .data/ab_jax_block_cyc/checkpoints --step 7 \
        --cfg configs/ab_drive0001_cyclist.yaml --class-name Cyclist \
        --data-dir .data/kitti_raw0001_block/validation \
        --out-dir .data/ab_jax_block_cyc/preds_lo/8/data --score-thres 0.05
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelnet_tpu.cli.train import _apply_platform_override

_apply_platform_override()

import jax
import jax.numpy as jnp

from voxelnet_tpu.config import get_config
from voxelnet_tpu.models.voxelnet import make_inference_fn
from voxelnet_tpu.training import checkpoint as ckpt_lib
from voxelnet_tpu.utils import kitti


def dump_predictions(infer, variables, config, data_dir, out_dir,
                     class_name, verbose=False):
    """Run the jitted inference graph over a split's velodyne/ frames and
    write KITTI-format label dumps (the shared A/B dump loop — also used
    by ab_transplant.py)."""
    velo = os.path.join(data_dir, "velodyne")
    os.makedirs(out_dir, exist_ok=True)
    tags = sorted(f[:-4] for f in os.listdir(velo) if f.endswith(".bin"))
    total = 0
    for tag in tags:
        pts = kitti.read_point_cloud(os.path.join(velo, tag + ".bin"))
        buf = np.zeros((1, config.data.max_points, 4), np.float32)
        n = min(len(pts), config.data.max_points)
        buf[0, :n] = pts[:n]
        det = infer(variables, jnp.asarray(buf), jnp.asarray([n], np.int32))
        keep = np.asarray(det.valid[0])
        boxes = np.asarray(det.boxes[0])[keep]
        scores = np.asarray(det.scores[0])[keep]
        P, Tr, R = kitti.load_calib(
            os.path.join(data_dir, "calib", tag + ".txt"))
        lines = kitti.boxes_to_label_lines(
            boxes, [class_name] * len(boxes), scores=scores,
            coordinate="lidar", P2=P, T_VELO_2_CAM=Tr, R_RECT_0=R)
        with open(os.path.join(out_dir, tag + ".txt"), "w") as f:
            f.writelines(lines)
        total += len(boxes)
        if verbose:
            print(tag, len(boxes), flush=True)
    return len(tags), total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoints root (cli.train exp layout)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--class-name", default="Car",
                   choices=("Car", "Pedestrian", "Cyclist"))
    p.add_argument("--data-dir", required=True,
                   help="split dir with velodyne/ calib/")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--score-thres", type=float, default=None)
    p.add_argument("--nms-mode", default=None,
                   choices=(None, "standup", "rotated"))
    args = p.parse_args()

    from dataclasses import replace

    config = get_config(args.class_name).merge_from_file(args.cfg)
    rpn = config.rpn
    if args.score_thres is not None:
        rpn = replace(rpn, score_thres=args.score_thres)
    if args.nms_mode is not None:
        rpn = replace(rpn, nms_mode=args.nms_mode)
    config = replace(config, rpn=rpn)

    path = args.checkpoint
    if args.step is not None:
        path = os.path.join(path, str(args.step))
    variables = ckpt_lib.load_variables(path)

    infer = jax.jit(make_inference_fn(config))
    nframes, total = dump_predictions(
        infer, variables, config, args.data_dir, args.out_dir,
        args.class_name)
    print(f"{nframes} frames, {total} boxes >= thres "
          f"{config.rpn.score_thres}", flush=True)


if __name__ == "__main__":
    main()
