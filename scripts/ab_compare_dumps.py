"""Box-level comparison of two KITTI prediction dump dirs.

The same-weights transplant parity check (scripts/ab_transplant.py) at
the AP level loses power when AP is near zero (e.g. the de-leaked
contiguous-block split, where 8-epoch models genuinely detect nothing
in the held-out tail). This compares the torch-native and
jax-transplanted dumps DIRECTLY: per frame, greedily match boxes by
BEV IoU and report match rate, mean matched IoU, and score agreement —
a stack-parity measure independent of how good the weights are.

    python scripts/ab_compare_dumps.py --a torch_preds/ --b jax_preds/ \
        --calib-dir .../validation/calib
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelnet_tpu.training.evaluate import box3d_iou_matrix_np  # noqa: E402
from voxelnet_tpu.utils import kitti  # noqa: E402


def load_dump(path, calib):
    P, Tr, R = kitti.load_calib(calib)
    with open(path) as f:
        lines = f.readlines()
    boxes = kitti.parse_label_lines(lines, "", "lidar", Tr, R)
    scores = []
    for ln in lines:
        parts = ln.split()
        scores.append(float(parts[15]) if len(parts) > 15 else 1.0)
    return boxes.reshape(-1, 7), np.asarray(scores, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="dump dir A (e.g. torch)")
    ap.add_argument("--b", required=True, help="dump dir B (e.g. jax)")
    ap.add_argument("--calib-dir", required=True)
    ap.add_argument("--iou", type=float, default=0.7,
                    help="BEV IoU threshold for a match")
    args = ap.parse_args()

    tags = sorted(set(os.listdir(args.a)) & set(os.listdir(args.b)))
    n_a = n_b = n_match = 0
    ious, score_diffs = [], []
    for tag in tags:
        calib = os.path.join(args.calib_dir, tag)
        ba, sa = load_dump(os.path.join(args.a, tag), calib)
        bb, sb = load_dump(os.path.join(args.b, tag), calib)
        n_a += len(ba)
        n_b += len(bb)
        if not len(ba) or not len(bb):
            continue
        m = box3d_iou_matrix_np(ba, bb, mode="bev")
        used = np.zeros(len(bb), bool)
        for i in np.argsort(-sa):
            j = int(np.argmax(np.where(used, -1.0, m[i])))
            if m[i, j] >= args.iou and not used[j]:
                used[j] = True
                n_match += 1
                ious.append(float(m[i, j]))
                score_diffs.append(float(abs(sa[i] - sb[j])))
    out = {
        "frames": len(tags),
        "boxes_a": n_a,
        "boxes_b": n_b,
        "matched": n_match,
        "match_rate": round(n_match / max(min(n_a, n_b), 1), 4),
        "mean_matched_bev_iou": round(float(np.mean(ious)), 4) if ious
        else None,
        "mean_abs_score_diff": round(float(np.mean(score_diffs)), 4)
        if score_diffs else None,
        "p95_abs_score_diff": round(float(np.percentile(score_diffs, 95)),
                                    4) if score_diffs else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
