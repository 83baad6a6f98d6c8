"""Score both A/B sides (framework-on-TPU vs reference-semantics torch)
on the synthesized drive-0001 validation split and print a markdown table.

North-star measurement driver (BASELINE.json: "3D AP @0.7 IoU parity vs
reference"). Walks every per-epoch prediction dump from both training
runs, computes KITTI 3D and BEV AP at the requested IoU thresholds with
the in-repo devkit-faithful evaluator (training/evaluate.py — the
reference's eval.py is an empty stub, voxelnet/eval.py:1-9), and emits
the table BASELINE.md records.

    VOXELNET_PLATFORM=cpu python scripts/ab_eval.py \
        --jax-exp .data/ab_jax --torch-out .data/ab_torch \
        --gt .data/kitti_raw0001/validation/label_2 \
        --calib-dir .data/kitti_raw0001/validation/calib
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelnet_tpu.cli.eval import load_frames_from_dirs
from voxelnet_tpu.training.evaluate import evaluate_ap


def epochs_of(preds_root):
    if not os.path.isdir(preds_root):
        return []
    out = []
    for name in os.listdir(preds_root):
        data = os.path.join(preds_root, name, "data")
        if name.isdigit() and os.path.isdir(data):
            out.append((int(name), data))
    return sorted(out)


def score(data_dir, gt, calib, class_name, ious, ap_points):
    frames = load_frames_from_dirs(data_dir, gt, class_name, calib)
    row = {}
    for iou in ious:
        for mode in ("3d", "bev"):
            res = evaluate_ap(frames, iou_thresh=iou, mode=mode,
                              num_points=ap_points)
            # moderate-difficulty AP is THE KITTI headline number
            row[f"{mode}@{iou}"] = {k: round(float(v), 4)
                                    for k, v in res.items() if v == v}
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--jax-exp", required=True,
                   help="framework exp dir (preds/<epoch>/data inside)")
    p.add_argument("--torch-out", required=True,
                   help="ab_torch_train.py out dir (preds/<epoch>/data)")
    p.add_argument("--gt", required=True)
    p.add_argument("--calib-dir", default=None)
    p.add_argument("--class-name", default="Car")
    p.add_argument("--ious", default="0.7,0.5")
    p.add_argument("--ap-points", type=int, default=11)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    ious = [float(x) for x in args.ious.split(",")]
    sides = {"jax": os.path.join(args.jax_exp, "preds"),
             "torch": os.path.join(args.torch_out, "preds")}
    results = {}
    for side, root in sides.items():
        results[side] = {}
        for epoch, data_dir in epochs_of(root):
            results[side][epoch] = score(
                data_dir, args.gt, args.calib_dir, args.class_name,
                ious, args.ap_points)
            print(f"{side} epoch {epoch}: "
                  f"{json.dumps(results[side][epoch])}", flush=True)

    print("\n| side | epoch | " + " | ".join(
        f"{m}@{i} (E/M/H)" for i in ious for m in ("3d", "bev")) + " |")
    print("|---|---|" + "---|" * (2 * len(ious)))
    for side in sides:
        for epoch in sorted(results[side]):
            cells = []
            for iou in ious:
                for mode in ("3d", "bev"):
                    r = results[side][epoch][f"{mode}@{iou}"]
                    cells.append("/".join(
                        f"{r.get(d, float('nan')):.3f}"
                        for d in ("easy", "moderate", "hard")))
            print(f"| {side} | {epoch} | " + " | ".join(cells) + " |")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
