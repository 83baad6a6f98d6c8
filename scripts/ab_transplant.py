"""Same-weights inference A/B: load a torch A/B checkpoint into the JAX
model and dump val predictions from BOTH inference stacks.

Training A/Bs compare noisy SGD endpoints; this removes the noise by
evaluating ONE set of weights (the torch side's epoch-N state_dict,
scripts/ab_torch_train.py) through both inference paths. With
`--nms-mode standup` the JAX graph reproduces the reference's AABB NMS
(voxelnet/model.py:39-48, utils.py:492-553), so matching AP means the
whole stack — voxelize, VFE, convs, decode, NMS, label emit — is
numerically equivalent end to end. `--nms-mode rotated` (framework
default) scores the same weights with exact rotated-BEV NMS.

    VOXELNET_PLATFORM=cpu python scripts/ab_transplant.py \
        --ckpt .data/ab_torch/model_ep8.pt --cfg configs/ab_drive0001.yaml \
        --data-dir .data/kitti_raw0001/validation --out-dir /tmp/transplant
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelnet_tpu.cli.train import _apply_platform_override

_apply_platform_override()

import jax
import jax.numpy as jnp
import torch

from scripts.bench_baseline_torch import TorchModel
from voxelnet_tpu.config import get_config
from voxelnet_tpu.models.voxelnet import init_params, make_inference_fn


def _j(t):
    return jnp.asarray(t.detach().cpu().numpy())


def _dense_in(params, tm):
    params["kernel"] = _j(tm.weight).T
    params["bias"] = _j(tm.bias)


def _bn_in(params, stats, tbn):
    params["scale"] = _j(tbn.weight)
    params["bias"] = _j(tbn.bias)
    stats["mean"] = _j(tbn.running_mean)
    stats["var"] = _j(tbn.running_var)


def _conv2d_in(params, tm):
    # torch (cout, cin, kh, kw) -> flax (kh, kw, cin, cout)
    params["kernel"] = _j(tm.weight).transpose(2, 3, 1, 0)
    params["bias"] = _j(tm.bias)


def _conv3d_in(params, tm):
    # torch (cout, cin, kd, kh, kw) -> flax (kd, kh, kw, cin, cout)
    params["kernel"] = _j(tm.weight).transpose(2, 3, 4, 1, 0)
    params["bias"] = _j(tm.bias)


def _deconv2d_in(params, tm):
    # inverse of tests/test_parity_torch._copy_deconv2d: torch
    # (cin, cout, kh, kw) -> flax (kh, kw, cin, cout) with flipped taps
    k = _j(tm.weight).transpose(2, 3, 0, 1)
    params["kernel"] = k[::-1, ::-1]
    params["bias"] = _j(tm.bias)


def transplant(variables, tm: TorchModel):
    """Inverse of tests/test_parity_torch._copy_weights (torch -> JAX)."""
    p, s = variables["params"], variables["batch_stats"]
    fn, sn = p["feature_net"], s["feature_net"]
    for name, tvfe in (("vfe1", tm.vfe1), ("vfe2", tm.vfe2)):
        _dense_in(fn[name]["fcn"], tvfe.fcn[0])
        _bn_in(fn[name]["bn"], sn[name]["bn"], tvfe.bn)

    mid, smid = p["middle"], s["middle"]
    for i in range(3):
        blk, sblk = mid[f"ConvBlock3D_{i}"], smid[f"ConvBlock3D_{i}"]
        _conv3d_in(blk["Conv_0"], tm.middle[i * 3])
        _bn_in(blk["BatchNorm_0"], sblk["BatchNorm_0"], tm.middle[i * 3 + 1])

    rpn, srpn = p["rpn"], s["rpn"]

    def copy_block(tblock, offset, count):
        for j in range(count):
            blk = rpn[f"ConvBNReLU_{offset + j}"]
            sblk = srpn[f"ConvBNReLU_{offset + j}"]
            _conv2d_in(blk["Conv_0"], tblock[j][0])
            _bn_in(blk["BatchNorm_0"], sblk["BatchNorm_0"], tblock[j][1])

    copy_block(tm.block1, 0, 5)
    copy_block(tm.block2, 5, 6)
    copy_block(tm.block3, 11, 6)
    for i, tdec in enumerate((tm.deconv1, tm.deconv2, tm.deconv3)):
        blk, sblk = rpn[f"DeconvBNReLU_{i}"], srpn[f"DeconvBNReLU_{i}"]
        _deconv2d_in(blk["ConvTranspose_0"], tdec[0])
        _bn_in(blk["BatchNorm_0"], sblk["BatchNorm_0"], tdec[1])
    _conv2d_in(rpn["prob_conv"], tm.prob_head)
    _conv2d_in(rpn["reg_conv"], tm.reg_head)
    return variables


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="torch state_dict .pt")
    p.add_argument("--cfg", required=True)
    p.add_argument("--class-name", default="Car",
                   choices=("Car", "Pedestrian", "Cyclist"))
    p.add_argument("--data-dir", required=True,
                   help="split dir with velodyne/ calib/")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--nms-mode", default="standup",
                   choices=("standup", "rotated"))
    p.add_argument("--score-thres", type=float, default=None,
                   help="override rpn.score_thres (undertrained ckpts "
                        "may emit nothing at the operating 0.25)")
    args = p.parse_args()

    from dataclasses import replace

    config = get_config(args.class_name).merge_from_file(args.cfg)
    rpn_over = {"nms_mode": args.nms_mode}
    if args.score_thres is not None:
        rpn_over["score_thres"] = args.score_thres
    config = replace(
        config,
        rpn=replace(config.rpn, **rpn_over),
        # inference-only path: f32 compute for a bit-close comparison
        # against torch f32 (bf16 is the production default)
        train=replace(config.train, compute_dtype="float32"),
        # the torch topology carries the REFERENCE VFE semantics (BN over
        # padded rows, max over ghost activations, voxelnet/model.py:74-100)
        # — weights trained under them only evaluate correctly under them
        compat=replace(config.compat, bn_over_padding=True))

    tm = TorchModel(config.object.grid_size)
    tm.load_state_dict(torch.load(args.ckpt))
    tm.eval()
    variables = transplant(init_params(config, jax.random.key(0)), tm)

    from scripts.ab_dump import dump_predictions

    infer = jax.jit(make_inference_fn(config))
    dump_predictions(infer, variables, config, args.data_dir,
                     args.out_dir, args.class_name, verbose=True)


if __name__ == "__main__":
    main()
