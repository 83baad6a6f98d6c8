#!/usr/bin/env python
"""Benchmark: KITTI Car-class inference frames/sec/chip (BASELINE.json metric).

Runs the FULL single-graph detector — on-device voxelization, VFE, dense
scatter, 3D middle convs, 2D RPN, anchor decode, rotated-BEV NMS — on real
KITTI velodyne frames, batched, on one chip. Prints ONE JSON line:

  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": x}

Baseline: the PyTorch reference's inference path measured on this image's
torch (CPU — the reference's fallback device, voxelnet/train.py:48-49) via
scripts/bench_baseline_torch.py; see BASELINE.md for the recorded run.
"""

from __future__ import annotations

import glob
import json
import time

import numpy as np

# torch-CPU reference fps measured with scripts/bench_baseline_torch.py
# (full pipeline: NumPy voxelize + torch net + NumPy decode/NMS).
BASELINE_FPS = None  # filled from BASELINE.md measurement; see below
try:
    with open(__file__.replace("bench.py", "BASELINE.md")) as _f:
        for _line in _f:
            if _line.startswith("<!-- baseline_fps="):
                BASELINE_FPS = float(
                    _line.split("=")[1].split(" ")[0].rstrip("->\n "))
except OSError:
    pass

DATA_GLOB = "/root/reference/data/2011_09_26/*/velodyne_points/data/*.bin"
BATCH = 24  # inference sweet spot on v5e (wpack+fused VFE): 101.6 @ B8, 110.1 @ B24, OOM @ B32
ITERS = 20


def load_frames(max_points: int, batch: int, spec=None):
    """Frames prepared exactly like the data pipeline: grid crop (when
    data.crop_to_grid — keeps ALL in-grid points, ~62k/frame, the same
    workload the torch-CPU baseline voxelized uncapped), shuffle, cap."""
    files = sorted(glob.glob(DATA_GLOB))
    rng = np.random.default_rng(0)
    clouds = []
    if files:
        for f in files[: batch * 4]:
            clouds.append(np.fromfile(f, np.float32).reshape(-1, 4))
    else:
        # no reference checkout: vendored real frames (same drive,
        # 5 mm-quantized — voxelnet_tpu/data/sample.py), tiled to fill
        from voxelnet_tpu.data.sample import sample_frames

        base = sample_frames()
        if base:
            clouds = [base[i % len(base)] for i in range(batch * 4)]
        else:  # last-resort synthetic
            for _ in range(batch * 4):
                n = 110_000
                clouds.append(np.concatenate([
                    rng.uniform([0, -40, -3], [70.4, 40, 1], (n, 3)),
                    rng.uniform(0, 1, (n, 1))], axis=1).astype(np.float32))

    batches = []
    for start in range(0, len(clouds) - batch + 1, batch):
        pts = np.zeros((batch, max_points, 4), np.float32)
        nums = np.zeros((batch,), np.int32)
        for i, pcl in enumerate(clouds[start:start + batch]):
            if spec is not None:
                from voxelnet_tpu.ops.voxelize import in_grid_mask
                pcl = pcl[in_grid_mask(pcl, spec)]
            pcl = pcl[rng.permutation(len(pcl))]
            n = min(len(pcl), max_points)
            pts[i, :n] = pcl[:n]
            nums[i] = n
        batches.append((pts, nums))
    return batches


def _make_stage_fn(stage: str, config, host_targets: bool = False,
                   vfe_backend: str = "xla", host_voxelize: bool = False,
                   dense_build: str = "scatter"):
    """Build (jitted chained fn, metric label[, batch prep]) per stage.

    Stages mirror the BASELINE.json config ladder:
      vfe     — voxelize + VFE stack (config 1)
      dense   — + sparse-to-dense scatter (config 2)
      infer   — full graph incl. decode + rotated NMS (config 3, default)
      train   — full training step (config 4); --host-targets feeds
                pipeline-precomputed target maps (the production trainer
                path) instead of assigning targets on device;
                --host-voxelize feeds pipeline-voxelized buffers (the
                KITTIDataset(host_voxelize=True) path) so the in-graph
                voxelizer drops out of the step entirely
      targets — on-device target assignment alone (train-step decomposition)

    Returns (chained, label) or (chained, label, prep); prep maps one
    host (points, num_points) batch to the tuple of arrays `chained`
    takes ahead of the salt argument.
    """
    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.models.vfe import FeatureLearningNet
    from voxelnet_tpu.models.scatter import scatter_to_dense
    from voxelnet_tpu.models.voxelnet import (
        build_model, init_params, make_inference_fn)
    from voxelnet_tpu.ops.voxelize import (
        VoxelGridSpec, resolve_backend, voxelize_batch_jax)

    spec = VoxelGridSpec.from_object_config(config.object)
    backend = resolve_backend(config.data.voxelizer_backend)
    variables = init_params(config, jax.random.key(0))

    if stage == "infer":
        infer = make_inference_fn(config)

        @jax.jit
        def chained(p, n, salt):
            det = infer(variables, p + salt, n)
            return det.scores.sum() * 0.0

        return chained, (f"KITTI frames/sec/chip ({config.object.name}, "
                         "inference, full graph incl. voxelize+rotated-NMS)")

    if stage in ("vfe", "dense", "middle"):
        from voxelnet_tpu.models.middle import MiddleLayers
        from voxelnet_tpu.models.scatter import scatter_to_dense_folded
        from voxelnet_tpu.models.voxelnet import resolve_middle_backend

        fln = FeatureLearningNet(dtype=jnp.bfloat16)
        fln_vars = {
            "params": variables["params"]["feature_net"],
            "batch_stats": variables["batch_stats"]["feature_net"],
        }
        middle_backend = resolve_middle_backend(config)

        def tail(vw, coords, counts):
            if stage == "vfe":
                return vw.sum().astype(jnp.float32) * 0.0
            if middle_backend == "sparse1" and stage == "middle":
                # block 1 reads the voxel table; no dense grid is built
                dense = (vw, coords, counts)
            elif middle_backend == "folded2d":
                dense = scatter_to_dense_folded(
                    vw, coords, counts, config.object.grid_size)
            elif dense_build == "pallas":
                from voxelnet_tpu.models.scatter import (
                    scatter_to_dense_streamed)
                dense = scatter_to_dense_streamed(
                    vw, coords, counts, config.object.grid_size)
            else:
                dense = scatter_to_dense(
                    vw, coords, counts, config.object.grid_size,
                    indices_sorted=config.data.scatter_hints)
            if stage == "dense":
                return dense.sum().astype(jnp.float32) * 0.0
            bev = MiddleLayers(
                dtype=jnp.bfloat16, backend=middle_backend,
                depth_in=config.object.grid_size[0],
                grid_hw=tuple(config.object.grid_size[1:])).apply(
                {"params": variables["params"]["middle"],
                 "batch_stats": variables["batch_stats"]["middle"]},
                dense, False)
            return bev.sum().astype(jnp.float32) * 0.0

        if vfe_backend == "fused":
            from voxelnet_tpu.kernels.vfe_fused import voxelize_vfe_fused

            @jax.jit
            def chained(p, n, salt):
                vw, coords, counts = voxelize_vfe_fused(
                    p + salt, n, spec, config.data.max_voxels,
                    fln_vars["params"], fln_vars["batch_stats"])
                return tail(vw, coords, counts)
        else:
            @jax.jit
            def chained(p, n, salt):
                vox = voxelize_batch_jax(p + salt, n, spec,
                                         config.data.max_voxels, backend)
                vw = fln.apply(fln_vars, vox.features, vox.counts,
                               train=False)
                return tail(vw, vox.coords, vox.counts)

        tag = " [fused pallas]" if vfe_backend == "fused" else ""
        cls = config.object.name
        label = {
            "vfe": f"KITTI frames/sec/chip ({cls}, voxelize+VFE{tag})",
            "dense": (f"KITTI frames/sec/chip ({cls}, voxelize+VFE+dense "
                      f"grid{tag})"),
            "middle": (f"KITTI frames/sec/chip ({cls}, voxelize+VFE+dense+"
                       f"middle[{middle_backend}]{tag})"),
        }[stage]
        return chained, label

    if stage == "train":
        from voxelnet_tpu.training import create_train_state, make_train_step
        from voxelnet_tpu.training.optim import make_optimizer

        tx = make_optimizer(config, steps_per_epoch=100)
        state_holder = [create_train_state(config, tx, jax.random.key(0))]
        step = make_train_step(config, tx, donate=True)
        gt = np.zeros((BATCH, config.data.max_gt_boxes, 7), np.float32)
        gt[:, 0] = [20.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
        gt_mask = np.zeros((BATCH, config.data.max_gt_boxes), bool)
        gt_mask[:, 0] = True
        extra = {"gt_boxes": jax.device_put(gt),
                 "gt_mask": jax.device_put(gt_mask)}
        if host_targets:
            from voxelnet_tpu.ops.targets import TargetPrecomputer

            pre = TargetPrecomputer(config)
            maps = pre({"gt_boxes": gt, "gt_mask": gt_mask})
            for k in ("target_pos", "target_neg", "target_reg"):
                extra[k] = jax.device_put(maps[k])

        if host_voxelize:
            from voxelnet_tpu.ops.voxelize import voxelize_np

            def prep(pts, nums):
                feats, crds, cnts = [], [], []
                for b in range(len(pts)):
                    vox = voxelize_np(pts[b, : nums[b]], spec,
                                      max_voxels=config.data.max_voxels)
                    feats.append(vox.features)
                    crds.append(vox.coords)
                    cnts.append(vox.counts)
                return (np.stack(feats), np.stack(crds),
                        np.stack(cnts).astype(np.int32))

            def chained(f, c, cnt, salt):
                batch = {"voxel_features": f + salt, "voxel_coords": c,
                         "voxel_counts": cnt, **extra}
                state_holder[0], metrics = step(state_holder[0], batch)
                return metrics["loss"] * 0.0

            kind = ("host voxels+targets" if host_targets
                    else "host voxels, on-device targets")
            return (chained,
                    f"KITTI frames/sec/chip ({config.object.name}, "
                    f"training step, {kind}+grads+SGD)", prep)

        def chained(p, n, salt):
            batch = {"points": p + salt, "num_points": n, **extra}
            state_holder[0], metrics = step(state_holder[0], batch)
            return metrics["loss"] * 0.0

        kind = ("host-precomputed targets" if host_targets
                else "on-device targets")
        return chained, (f"KITTI frames/sec/chip ({config.object.name}, "
                         f"training step, {kind}+grads+SGD)")

    if stage == "targets":
        from voxelnet_tpu.training.train_step import _compute_target_maps

        gt = np.zeros((BATCH, config.data.max_gt_boxes, 7), np.float32)
        gt[:, :8] = [20.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
        gt_mask = np.zeros((BATCH, config.data.max_gt_boxes), bool)
        gt_mask[:, :8] = True
        gt = jax.device_put(gt)
        gt_mask = jax.device_put(gt_mask)

        @jax.jit
        def chained(p, n, salt):
            pos, neg, reg = _compute_target_maps(
                config, gt + salt * 0.0, gt_mask)
            return (pos.sum() + reg.sum()) * 0.0 + salt * 0.0

        return chained, (f"KITTI frames/sec/chip ({config.object.name}, "
                         "on-device target assignment only)")

    raise SystemExit(f"unknown stage {stage!r}")


def main(argv=None):
    global BATCH
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="infer",
                    choices=("vfe", "dense", "middle", "infer", "train",
                             "targets"))
    ap.add_argument("--middle-backend", default=None,
                    choices=("auto", "conv3d", "folded2d", "tap2d",
                             "sparse1", "sparsebwd", "wpack", "wpack2"),
                    help="override data.middle_backend (conv3d = plain "
                         "Conv3D; folded2d = depth-folded Conv2D; tap2d "
                         "= per-depth-tap batched Conv2D; sparse1 = "
                         "block 1 off the voxel table, no C=128 dense "
                         "scatter; sparsebwd = conv3d forward + "
                         "slice-gather sparse backward; wpack = W-paired "
                         "full-MXU-width Conv3D)")
    ap.add_argument("--voxelizer-backend", default=None,
                    choices=("auto", "xla", "gather", "pallas", "planar"),
                    help="override data.voxelizer_backend for the "
                         "in-graph table build (train stage; 'gather' = "
                         "K contiguous (T,4) run-slice gathers instead "
                         "of the per-point row scatter)")
    ap.add_argument("--class-name", default="Car",
                    choices=("Car", "Pedestrian", "Cyclist"))
    ap.add_argument("--host-targets", action="store_true",
                    help="train stage: feed pipeline-precomputed target "
                         "maps (production trainer path)")
    ap.add_argument("--host-voxelize", action="store_true",
                    help="train stage: feed pipeline-voxelized buffers "
                         "(KITTIDataset(host_voxelize=True) path); the "
                         "in-graph voxelizer drops out of the step")
    ap.add_argument("--vfe-backend", default="xla",
                    choices=("xla", "fused", "planar"),
                    help="vfe/dense stages: 'fused' = single Pallas "
                         "kernel for table build + VFE stack; train "
                         "stage: 'planar' = Pallas run-copy table in "
                         "voxel-major layout + planar VFE "
                         "(data.train_vfe_backend)")
    ap.add_argument("--dense-build", default="scatter",
                    choices=("scatter", "pallas"),
                    help="dense/middle stages: sparse->dense grid "
                         "lowering (data.dense_build)")
    ap.add_argument("--remat", default=None,
                    choices=("none", "seams", "full"),
                    help="train stage: override train.remat (forward "
                         "rematerialization in backward — the HBM lever "
                         "for large train batches; see config.TrainConfig)")
    ap.add_argument("--batch", type=int, default=None,
                    help=f"frames per device batch (default {BATCH})")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed repetitions; value = mean, spread = "
                         "max-min across runs")
    args = ap.parse_args(argv)
    if args.batch is not None:
        if args.batch < 1:
            ap.error(f"--batch must be >= 1, got {args.batch}")
        BATCH = args.batch

    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.config import get_config

    data_over = {}
    if args.middle_backend is not None:
        data_over["middle_backend"] = args.middle_backend
    if args.voxelizer_backend is not None:
        data_over["voxelizer_backend"] = args.voxelizer_backend
    if args.stage == "train" and args.vfe_backend == "planar":
        data_over["train_vfe_backend"] = "planar"
    overrides = {"data": data_over} if data_over else {}
    if args.remat is not None:
        overrides["train"] = {"remat": args.remat}
    config = get_config(args.class_name, **overrides)
    made = _make_stage_fn(args.stage, config, args.host_targets,
                          args.vfe_backend, args.host_voxelize,
                          args.dense_build)
    chained, label = made[0], made[1]
    prep = made[2] if len(made) > 2 else (lambda p, n: (p, n))

    from voxelnet_tpu.ops.voxelize import VoxelGridSpec
    crop_spec = (VoxelGridSpec.from_object_config(config.object)
                 if config.data.crop_to_grid else None)
    batches = load_frames(config.data.max_points, BATCH, spec=crop_spec)
    dev_batches = [tuple(jax.device_put(a) for a in prep(p, n))
                   for p, n in batches]

    # Chain a zero-valued salt through iterations so the device executes
    # every step serially and ONE final value fetch closes the pipeline.
    # (On tunneled backends, block_until_ready/per-step fetches measure
    # round-trip latency, not device throughput.)
    salt = chained(*dev_batches[0], jnp.float32(0))
    float(salt)  # warmup / compile

    # repeat the timed chain to quantify run-to-run variance (round-2
    # recorded single measurements drifting ~2% between sessions)
    fps_runs = []
    for _ in range(max(1, args.repeats)):
        salt = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(ITERS):
            salt = chained(*dev_batches[i % len(dev_batches)], salt)
        float(salt)  # forces the whole chain
        elapsed = time.perf_counter() - t0
        fps_runs.append(BATCH * ITERS / elapsed)

    fps = float(np.mean(fps_runs))
    spread = float(np.max(fps_runs) - np.min(fps_runs))
    result = {
        "metric": label,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": (round(fps / BASELINE_FPS, 2)
                        if BASELINE_FPS and args.stage == "infer" else None),
        "repeats": len(fps_runs),
        "spread": round(spread, 2),
        "runs": [round(v, 2) for v in fps_runs],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
