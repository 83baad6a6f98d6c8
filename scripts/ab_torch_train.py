"""Train the reference-semantics torch model for the real-data AP A/B.

One half of the north-star measurement (BASELINE.json: "3D AP @0.7 IoU
parity vs reference"): trains the stage-parity torch topology
(scripts/bench_baseline_torch.TorchModel — voxelnet/model.py:60-281
semantics) on the drive-0001 KITTI-format dataset synthesized by
data/raw_to_kitti.py, with the reference's training recipe
(voxelnet/train.py:130-155: SGD lr=0.01, grad clip 5, batch 1) and the
same corrected loss/targets this framework trains with (ops/losses.py,
ops/targets.assign_targets_np), then dumps KITTI-format val predictions
for cli.eval. The framework side trains on the identical config via
cli.train; BASELINE.md records both APs.

    python scripts/ab_torch_train.py --data-dir .data/kitti_raw0001 \
        --cfg configs/ab_drive0001.yaml --out-dir .data/ab_torch
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.bench_baseline_torch import TorchModel, aabb_nms
from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops.anchors import anchors_flat
from voxelnet_tpu.ops.targets import TargetPrecomputer
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_np
from voxelnet_tpu.utils import geometry, kitti


def smooth_l1_torch(diff, sigma=3.0):
    sigma2 = sigma * sigma
    quad = 0.5 * sigma2 * diff * diff
    lin = diff.abs() - 0.5 / sigma2
    return torch.where(diff.abs() < 1.0 / sigma2, quad, lin)


def rpn_loss_torch(cls_logits, reg, pos, neg, reg_t,
                   alpha=1.5, beta=1.0, sigma=3.0):
    """Mirror of voxelnet_tpu.ops.losses.rpn_loss (NHWC maps in, scalars
    out) so both A/B sides optimize the identical objective."""
    pos_sum = pos.sum(dim=(1, 2, 3)).clamp(min=1.0)[:, None, None, None]
    neg_sum = neg.sum(dim=(1, 2, 3)).clamp(min=1.0)[:, None, None, None]
    log_p = torch.nn.functional.logsigmoid(cls_logits)
    log_not_p = torch.nn.functional.logsigmoid(-cls_logits)
    cls_loss = (alpha * (-pos * log_p) / pos_sum
                + beta * (-neg * log_not_p) / neg_sum).sum()
    pos_reg = pos.repeat_interleave(7, dim=-1)
    reg_l = smooth_l1_torch(reg * pos_reg - reg_t * pos_reg, sigma)
    reg_loss = (reg_l / pos_sum).sum()
    return cls_loss + reg_loss, cls_loss, reg_loss


class FrameStore:
    """Voxelize + target-assign each frame once (the 1-core CPU budget
    goes to the network, not to re-voxelizing identical frames)."""

    def __init__(self, data_dir, config, with_targets=True):
        self.dir = data_dir
        self.spec = VoxelGridSpec.from_object_config(config.object)
        self.config = config
        self.pre = TargetPrecomputer(config) if with_targets else None
        self.tags = sorted(
            f[:-4] for f in os.listdir(os.path.join(data_dir, "velodyne"))
            if f.endswith(".bin"))
        self.cache = {}

    def __getitem__(self, tag):
        if tag in self.cache:
            return self.cache[tag]
        pts = kitti.read_point_cloud(
            os.path.join(self.dir, "velodyne", tag + ".bin"))
        vox = voxelize_np(pts, self.spec)
        with open(os.path.join(self.dir, "label_2", tag + ".txt")) as f:
            lines = f.readlines()
        calib = os.path.join(self.dir, "calib", tag + ".txt")
        P, Tr, R = kitti.load_calib(calib)
        gt = kitti.parse_label_lines(lines, self.config.object.name,
                                     "lidar", Tr, R)
        item = {"vox": vox, "gt": gt, "calib": (P, Tr, R)}
        if self.pre is not None:
            g, m = kitti.pad_gt_boxes(gt, self.config.data.max_gt_boxes)
            maps = self.pre({"gt_boxes": g[None], "gt_mask": m[None]})
            item["targets"] = tuple(
                torch.from_numpy(maps[k]) for k in
                ("target_pos", "target_neg", "target_reg"))
        self.cache[tag] = item
        return item


def decode_and_dump(model, store, config, out_dir):
    """Reference inference semantics: decode, score threshold, AABB NMS
    (voxelnet/model.py:28-57), dump KITTI label lines with scores."""
    anchors = anchors_flat(config.object)
    diag = np.sqrt(anchors[:, 4] ** 2 + anchors[:, 5] ** 2)
    os.makedirs(out_dir, exist_ok=True)
    model.eval()
    with torch.no_grad():
        for tag in store.tags:
            item = store[tag]
            vox = item["vox"]
            k = int(vox.num_voxels)
            feats = torch.from_numpy(vox.features[:k])
            coords = np.pad(vox.coords[:k], ((0, 0), (1, 0)))
            probs, deltas = model(feats,
                                  torch.from_numpy(coords.astype(np.int64)),
                                  1)
            d = deltas.numpy().transpose(0, 2, 3, 1).reshape(-1, 7)
            boxes = np.zeros_like(d)
            boxes[:, 0:2] = d[:, 0:2] * diag[:, None] + anchors[:, 0:2]
            boxes[:, 2] = d[:, 2] * config.object.anchor_h + anchors[:, 2]
            boxes[:, 3:6] = np.exp(d[:, 3:6]) * anchors[:, 3:6]
            boxes[:, 6] = d[:, 6] + anchors[:, 6]
            pr = probs.numpy().transpose(0, 2, 3, 1).reshape(-1)
            sel = pr >= config.rpn.score_thres
            lines = []
            if sel.sum():
                cand, sc = boxes[sel], pr[sel]
                # reference NMS boxes are the AABB of the ROTATED BEV
                # corners (voxelnet/model.py:39-41), not naive (x±l/2,
                # y±w/2) — yaw widens the standup box
                corners = geometry.center_to_corner_box2d(
                    cand[:, [0, 1, 4, 5, 6]])
                standup = geometry.corner_to_standup_box2d(corners)
                keep = aabb_nms(standup, sc, config.rpn.nms_thres,
                                config.rpn.nms_post_topk)
                P, Tr, R = item["calib"]
                lines = kitti.boxes_to_label_lines(
                    cand[keep], [config.object.name] * len(keep),
                    scores=sc[keep], coordinate="lidar",
                    P2=P, T_VELO_2_CAM=Tr, R_RECT_0=R)
            with open(os.path.join(out_dir, tag + ".txt"), "w") as f:
                f.writelines(lines)
    model.train()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True)
    p.add_argument("--cfg", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--epochs", type=int, default=None,
                   help="override config num_epochs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--class-name", default="Car",
                   choices=("Car", "Pedestrian", "Cyclist"))
    p.add_argument("--init-from", type=str, default=None,
                   help="state_dict .pt to continue from")
    p.add_argument("--start-epoch", type=int, default=0,
                   help="epoch offset for logging/dump dirs when resuming")
    p.add_argument("--score-thres", type=float, default=None,
                   help="override rpn.score_thres for the dumps")
    p.add_argument("--dump-only", action="store_true",
                   help="skip training: load --init-from and dump val "
                        "predictions once into preds/<start-epoch>/data "
                        "(re-dump undertrained ckpts at a lower "
                        "--score-thres)")
    args = p.parse_args()

    torch.manual_seed(args.seed)
    config = get_config(args.class_name).merge_from_file(args.cfg)
    if args.score_thres is not None:
        from dataclasses import replace
        config = replace(
            config, rpn=replace(config.rpn, score_thres=args.score_thres))
    epochs = args.epochs or config.train.num_epochs

    if args.dump_only:
        if not args.init_from:
            p.error("--dump-only requires --init-from (a trained "
                    "state_dict .pt to dump predictions from)")
        val_store = FrameStore(
            os.path.join(args.data_dir, "validation"), config,
            with_targets=False)
        model = TorchModel(config.object.grid_size)
        model.load_state_dict(torch.load(args.init_from))
        decode_and_dump(model, val_store, config,
                        os.path.join(args.out_dir, "preds",
                                     str(args.start_epoch), "data"))
        return

    train_store = FrameStore(
        os.path.join(args.data_dir, "training"), config)
    val_store = FrameStore(
        os.path.join(args.data_dir, "validation"), config,
        with_targets=False)
    model = TorchModel(config.object.grid_size)
    if args.init_from:
        model.load_state_dict(torch.load(args.init_from))
    opt = torch.optim.SGD(model.parameters(), lr=config.train.lr)
    # the reference's schedule: 10x LR drop at epoch lr_scheduler_step
    # (voxelnet/train.py:131-132 MultiStepLR) — the framework side applies
    # the same drop via optax, so long-horizon A/Bs stay comparable
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[config.train.lr_scheduler_step], gamma=0.1,
        last_epoch=args.start_epoch - 1 if args.start_epoch else -1)

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed + args.start_epoch)
    step = 0
    t_start = time.time()
    for epoch in range(args.start_epoch, args.start_epoch + epochs):
        order = rng.permutation(len(train_store.tags))
        ep_loss = []
        for idx in order:
            item = train_store[train_store.tags[idx]]
            vox = item["vox"]
            k = int(vox.num_voxels)
            feats = torch.from_numpy(vox.features[:k])
            coords = np.pad(vox.coords[:k], ((0, 0), (1, 0)))
            cls_logits, reg = model(
                feats, torch.from_numpy(coords.astype(np.int64)), 1,
                logits=True)
            pos, neg, reg_t = item["targets"]
            loss, cls_l, reg_l = rpn_loss_torch(
                cls_logits.permute(0, 2, 3, 1), reg.permute(0, 2, 3, 1),
                pos, neg, reg_t,
                alpha=config.train.alpha, beta=config.train.beta,
                sigma=config.train.sigma)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           config.train.gradient_clip)
            opt.step()
            step += 1
            ep_loss.append(float(loss))
            if step % 10 == 0:
                el = time.time() - t_start
                print(f"step {step} epoch {epoch + 1}/{epochs} "
                      f"loss {float(loss):.4f} ({el / step:.1f}s/step)",
                      flush=True)
        print(f"epoch {epoch + 1} mean loss {np.mean(ep_loss):.4f}",
              flush=True)
        sched.step()
        decode_and_dump(model, val_store, config,
                        os.path.join(args.out_dir, "preds",
                                     str(epoch + 1), "data"))
        torch.save(model.state_dict(),
                   os.path.join(args.out_dir, f"model_ep{epoch + 1}.pt"))
    torch.save(model.state_dict(),
               os.path.join(args.out_dir, "model_final.pt"))
    meta = {"steps": step, "epochs": epochs,
            "seconds": time.time() - t_start,
            "sec_per_step": (time.time() - t_start) / max(step, 1)}
    with open(os.path.join(args.out_dir, "train_meta.json"), "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
