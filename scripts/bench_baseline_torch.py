"""Measure the PyTorch reference's runtime behavior on this machine (CPU).

The reference repo publishes no benchmark numbers (BASELINE.md), so the
comparison row must be produced. This is a fresh re-implementation of the
reference's inference path with identical topology and semantics
(voxelnet/model.py:60-281, predict.py:46-72): host NumPy voxelization,
ragged VFE -> sparse-to-dense -> Conv3d middle -> Conv2d RPN in
channels-first torch, NumPy anchor decode, score threshold + AABB NMS.
torch in this image is CPU-only — the same fallback the reference uses
without CUDA (voxelnet/train.py:48-49).

Run:  python scripts/bench_baseline_torch.py [--frames 8]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops.anchors import anchors_flat
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_np

DATA_GLOB = "/root/reference/data/2011_09_26/*/velodyne_points/data/*.bin"


class TorchVFE(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.fcn = nn.Sequential(nn.Linear(cin, cout // 2), nn.ReLU())
        self.bn = nn.BatchNorm1d(cout // 2)
        self.units = cout // 2

    def forward(self, x, mask):
        t = self.fcn(x).transpose(1, 2)
        pw = self.bn(t).transpose(1, 2)
        agg = pw.max(dim=1, keepdim=True).values
        out = torch.cat([pw, agg.expand(-1, x.shape[1], -1)], dim=2)
        return out * mask.expand(-1, -1, 2 * self.units).float()


class TorchModel(nn.Module):
    def __init__(self, grid_dzyx):
        super().__init__()
        self.grid = grid_dzyx
        self.vfe1 = TorchVFE(7, 32)
        self.vfe2 = TorchVFE(32, 128)

        def conv2(cin, cout, s):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, s, 1),
                                 nn.BatchNorm2d(cout), nn.ReLU())

        self.middle = nn.Sequential(
            nn.Conv3d(128, 64, 3, (2, 1, 1), (1, 1, 1)),
            nn.BatchNorm3d(64), nn.ReLU(),
            nn.Conv3d(64, 64, 3, (1, 1, 1), (0, 1, 1)),
            nn.BatchNorm3d(64), nn.ReLU(),
            nn.Conv3d(64, 64, 3, (2, 1, 1), (1, 1, 1)),
            nn.BatchNorm3d(64), nn.ReLU(),
        )
        self.block1 = nn.Sequential(conv2(128, 128, 2),
                                    *[conv2(128, 128, 1) for _ in range(4)])
        self.deconv1 = nn.Sequential(
            nn.ConvTranspose2d(128, 256, 3, 1, 1), nn.BatchNorm2d(256),
            nn.ReLU())
        self.block2 = nn.Sequential(conv2(128, 128, 2),
                                    *[conv2(128, 128, 1) for _ in range(5)])
        self.deconv2 = nn.Sequential(
            nn.ConvTranspose2d(128, 256, 2, 2, 0), nn.BatchNorm2d(256),
            nn.ReLU())
        self.block3 = nn.Sequential(conv2(128, 256, 2),
                                    *[conv2(256, 256, 1) for _ in range(5)])
        self.deconv3 = nn.Sequential(
            nn.ConvTranspose2d(256, 256, 4, 4, 0), nn.BatchNorm2d(256),
            nn.ReLU())
        self.prob_head = nn.Conv2d(768, 2, 1)
        self.reg_head = nn.Conv2d(768, 14, 1)

    def forward(self, feats, coords, bs, logits=False):
        mask = (feats.max(dim=2, keepdim=True).values != 0)
        x = self.vfe1(feats, mask)
        x = self.vfe2(x, mask)
        voxelwise = x.max(dim=1).values
        D, H, W = self.grid
        dense = torch.sparse_coo_tensor(
            coords.t(), voxelwise, (bs, D, H, W, 128)).to_dense()
        x = dense.permute(0, 4, 1, 2, 3)
        x = self.middle(x)
        x = x.reshape(bs, -1, H, W)
        b1 = self.block1(x)
        u1 = self.deconv1(b1)
        b2 = self.block2(b1)
        u2 = self.deconv2(b2)
        b3 = self.block3(b2)
        u3 = self.deconv3(b3)
        feats2d = torch.cat([u3, u2, u1], dim=1)
        cls = self.prob_head(feats2d)
        if not logits:
            cls = torch.sigmoid(cls)
        return cls, self.reg_head(feats2d)


def aabb_nms(boxes, scores, thresh, topk):
    order = np.argsort(-scores)
    keep = []
    while len(order) and len(keep) < topk:
        i = order[0]
        keep.append(i)
        if len(order) == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = ((boxes[order[1:], 2] - boxes[order[1:], 0])
               * (boxes[order[1:], 3] - boxes[order[1:], 1]))
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = order[1:][iou <= thresh]
    return keep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()

    torch.set_grad_enabled(False)
    cfg = get_config("Car")
    spec = VoxelGridSpec.from_object_config(cfg.object)
    anchors = anchors_flat(cfg.object)
    diag = np.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)

    model = TorchModel(cfg.object.grid_size).eval()

    files = sorted(glob.glob(DATA_GLOB))[: args.frames]
    clouds = [np.fromfile(f, np.float32).reshape(-1, 4) for f in files]

    # warmup
    def run(pcl):
        t0 = time.perf_counter()
        vox = voxelize_np(pcl, spec)
        t_vox = time.perf_counter() - t0
        feats = torch.from_numpy(vox.features)
        coords = np.pad(vox.coords, ((0, 0), (1, 0)))
        coords = torch.from_numpy(coords.astype(np.int64))
        t0 = time.perf_counter()
        probs, deltas = model(feats, coords, 1)
        t_net = time.perf_counter() - t0
        t0 = time.perf_counter()
        d = deltas.numpy().transpose(0, 2, 3, 1).reshape(-1, 7)
        boxes = np.zeros_like(d)
        boxes[:, 0:2] = d[:, 0:2] * diag[:, None] + anchors[:, 0:2]
        boxes[:, 2] = d[:, 2] * cfg.object.anchor_h + anchors[:, 2]
        boxes[:, 3:6] = np.exp(d[:, 3:6]) * anchors[:, 3:6]
        boxes[:, 6] = d[:, 6] + anchors[:, 6]
        pr = probs.numpy().transpose(0, 2, 3, 1).reshape(-1)
        sel = pr >= cfg.rpn.score_thres
        if sel.sum():
            bev = boxes[sel][:, [0, 1, 4, 5]]
            standup = np.stack([
                bev[:, 0] - bev[:, 3] / 2, bev[:, 1] - bev[:, 2] / 2,
                bev[:, 0] + bev[:, 3] / 2, bev[:, 1] + bev[:, 2] / 2], 1)
            aabb_nms(standup, pr[sel], cfg.rpn.nms_thres,
                     cfg.rpn.nms_post_topk)
        t_post = time.perf_counter() - t0
        return t_vox, t_net, t_post

    run(clouds[0])  # warmup

    times = []
    for pcl in clouds:
        times.append(run(pcl))
    times = np.array(times)
    total = times.sum(axis=1)
    print(f"frames: {len(clouds)}")
    print(f"voxelize  ms/frame: {1e3 * times[:, 0].mean():.1f}")
    print(f"network   ms/frame: {1e3 * times[:, 1].mean():.1f}")
    print(f"postproc  ms/frame: {1e3 * times[:, 2].mean():.1f}")
    print(f"total     ms/frame: {1e3 * total.mean():.1f}")
    print(f"fps: {1.0 / total.mean():.3f}")


if __name__ == "__main__":
    main()
