"""Sustained END-TO-END train throughput: threaded host pipeline + device.

bench.py --stage train times the device step with pre-staged buffers; this
probe measures what a user actually gets — the trainer's production loop
(LazyBatchIterator workers -> host targets -> double-buffered device_put ->
jitted train step) over real KITTI frames, including file IO, host
voxelization (when train.host_voxelize) and H2D transfer. The interesting
comparison on this 1-core host:

  --host-vox off            on-device voxelizer, host does IO+targets only
  --host-vox numpy          host_voxelize with the NumPy twin (~41 ms/frame)
  --host-vox native         host_voxelize with the C++ voxelizer (~2.6 ms)

Sync discipline: ONE loss fetch per epoch (the axon backend resolves
futures lazily; a value fetch is the only real sync — CLAUDE.md), so the
epoch wall time brackets fully-retired device work.

Usage: python scripts/probe_pipeline.py --data .data/kitti_raw0001_block/training \
           --host-vox native --batch 8 --epochs 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".data/kitti_raw0001_block/training")
    ap.add_argument("--class-name", default="Car")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=6,
                    help="timed epochs (one extra warmup epoch runs first)")
    ap.add_argument("--host-vox", default="off",
                    choices=("off", "numpy", "native"),
                    help="default matches the shipped config (device "
                         "voxelize): host buffers are ~116 MB/batch8 and "
                         "lose on a thin H2D link (BASELINE.md)")
    ap.add_argument("--host-targets", default="off", choices=("on", "off"),
                    help="off (default, the shipped config) = assign "
                         "targets on device: ships tiny gt_boxes instead "
                         "of ~20 MB/batch of target maps — the lever "
                         "that matters on a thin H2D link")
    ap.add_argument("--workers", type=int, default=None,
                    help="pipeline worker threads (default: train config)")
    ap.add_argument("--upload", default="f32", choices=("f32", "i16q"),
                    help="point wire format (train.upload_points): "
                         "'i16q' halves the per-step H2D bytes")
    ap.add_argument("--depth", type=int, default=None,
                    help="staging depth: batches device_put ahead of "
                         "the running step (default: the train config's "
                         "staging_depth, so probe numbers match the "
                         "trainer)")
    ap.add_argument("--stage-thread", action="store_true",
                    help="stage (host fetch + device_put) on a background "
                         "thread instead of between steps on the main "
                         "thread — overlaps the ~40 ms/batch client issue "
                         "work with dispatch on the 1-core host")
    ap.add_argument("--decompose", action="store_true",
                    help="price the end-to-end residual to a floor "
                         "(VERDICT r04 #4): measure the three overlapped "
                         "components separately — host pipeline rate (no "
                         "device), H2D staging rate (no step), device "
                         "step rate (pre-staged) — and print the "
                         "perfect-overlap floor next to the measured "
                         "end-to-end epochs")
    args = ap.parse_args()

    from voxelnet_tpu.cli.train import _apply_platform_override

    _apply_platform_override()
    import jax

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.data.dataset import KITTIDataset
    from voxelnet_tpu.data.pipeline import LazyBatchIterator
    from voxelnet_tpu.ops.targets import TargetPrecomputer
    from voxelnet_tpu.training.optim import make_optimizer
    from voxelnet_tpu.training.train_step import (create_train_state,
                                                  make_train_step)

    host_vox = args.host_vox != "off"
    config = get_config(
        args.class_name,
        data={"host_voxelizer": args.host_vox if host_vox else "auto"},
        train={"batch_size": args.batch, "host_voxelize": host_vox,
               "host_targets": args.host_targets == "on",
               "upload_points": args.upload},
    )
    if args.depth is None:
        args.depth = config.train.staging_depth
    ds = KITTIDataset(args.data, config, host_voxelize=host_vox)
    steps = max(1, len(ds) // args.batch)
    tx = make_optimizer(config, steps)
    state = create_train_state(config, tx, jax.random.key(0))
    train_step = make_train_step(config, tx)
    transforms = []
    if config.train.host_targets:
        transforms.append(TargetPrecomputer(config))
    if args.upload == "i16q":
        # quantize on the worker threads, like the production trainer
        from voxelnet_tpu.ops.voxelize import quantize_points_i16
        import numpy as _np

        def _quantize(batch):
            pts = batch.get("points")
            if pts is not None and pts.dtype == _np.float32:
                batch = dict(batch)
                batch["points"] = quantize_points_i16(pts)
            return batch

        transforms.append(_quantize)
    transform = None
    if transforms:
        def transform(batch, _ts=tuple(transforms)):  # noqa: F811
            for t in _ts:
                batch = t(batch)
            return batch
    workers = args.workers or config.train.num_workers

    def run_epoch(epoch):
        ds.set_epoch(epoch)
        it = iter(LazyBatchIterator(ds, args.batch, shuffle=True,
                                    seed=epoch, workers=workers,
                                    transform=transform))
        import numpy as np

        def stage(b):
            arrays = {k: v for k, v in b.items()
                      if isinstance(v, np.ndarray)}
            return {k: jax.device_put(v) for k, v in arrays.items()}

        nonlocal state
        t0 = time.perf_counter()
        n = 0
        metrics = None
        if args.stage_thread:
            import queue
            import threading

            q = queue.Queue(maxsize=max(1, args.depth))
            errs = []

            def stager():
                try:
                    for b in it:
                        q.put(stage(b))
                except BaseException as e:  # surface in the main thread
                    errs.append(e)
                finally:
                    q.put(None)

            th = threading.Thread(target=stager, daemon=True)
            th.start()
            while True:
                d = q.get()
                if d is None:
                    break
                state, metrics = train_step(state, d)
                n += 1
            th.join()
            if errs:
                raise errs[0]
        else:
            import collections

            def stage_next():
                b = next(it, None)
                return None if b is None else stage(b)

            staged = collections.deque()
            for _ in range(max(1, args.depth)):
                b = stage_next()
                if b is not None:
                    staged.append(b)
            while staged:
                state, metrics = train_step(state, staged.popleft())
                n += 1
                b = stage_next()
                if b is not None:
                    staged.append(b)
        loss = float(metrics["loss"])  # the one real sync
        return time.perf_counter() - t0, n, loss

    wall, n, loss = run_epoch(0)  # warmup: compile + cache fill
    print(f"warmup epoch: {wall:.1f}s ({n} steps, loss {loss:.3f})",
          file=sys.stderr)

    if args.decompose:
        import numpy as np

        # --- component 1: host pipeline alone (workers + transforms,
        # no device_put, no step) ---
        ds.set_epoch(100)
        t0 = time.perf_counter()
        nb = 0
        host_batches = []
        for b in LazyBatchIterator(ds, args.batch, shuffle=True, seed=100,
                                   workers=workers, transform=transform):
            nb += 1
            if len(host_batches) < args.depth + 1:
                host_batches.append({
                    k: v for k, v in b.items()
                    if isinstance(v, np.ndarray)})
        host_s = (time.perf_counter() - t0) / nb
        bytes_per_batch = sum(v.nbytes for v in host_batches[0].values())

        # --- component 2: device step alone (pre-staged buffers,
        # chained, ONE final fetch) — the device-side ceiling ---
        staged = [{k: jax.device_put(v) for k, v in hb.items()}
                  for hb in host_batches]
        nsteps = 24
        t0 = time.perf_counter()
        st = state
        m = None
        for i in range(nsteps):
            st, m = train_step(st, staged[i % len(staged)])
        float(m["loss"])
        dev_s = (time.perf_counter() - t0) / nsteps
        state = st  # the step donates its input state — keep the live one

        # --- component 3: an INSTRUMENTED production epoch. Everything
        # is async on this backend (CLAUDE.md), so client wall time
        # decomposes into blocking host-iterator waits, device_put issue
        # time, step dispatch time, and the single tail sync; the
        # device-side residual is wall - n*dev_s. ---
        ds.set_epoch(101)
        it = iter(LazyBatchIterator(ds, args.batch, shuffle=True,
                                    seed=101, workers=workers,
                                    transform=transform))
        t_next = t_put = t_disp = 0.0

        def stage_timed():
            nonlocal t_next, t_put
            t0 = time.perf_counter()
            b = next(it, None)
            t_next += time.perf_counter() - t0
            if b is None:
                return None
            arrays = {k: v for k, v in b.items()
                      if isinstance(v, np.ndarray)}
            t0 = time.perf_counter()
            out = {k: jax.device_put(v) for k, v in arrays.items()}
            t_put += time.perf_counter() - t0
            return out

        import collections
        te0 = time.perf_counter()
        q = collections.deque()
        for _ in range(max(1, args.depth)):
            b = stage_timed()
            if b is not None:
                q.append(b)
        n = 0
        m = None
        while q:
            t0 = time.perf_counter()
            state, m = train_step(state, q.popleft())
            t_disp += time.perf_counter() - t0
            n += 1
            b = stage_timed()
            if b is not None:
                q.append(b)
        t0 = time.perf_counter()
        float(m["loss"])
        t_sync = time.perf_counter() - t0
        wall = time.perf_counter() - te0

        print(json.dumps({
            "metric": "end-to-end residual decomposition (s/batch)",
            "batch": args.batch,
            "h2d_bytes_per_batch": int(bytes_per_batch),
            "host_pipeline_alone": round(host_s, 4),
            "device_step_alone": round(dev_s, 4),
            "epoch_wall_per_batch": round(wall / n, 4),
            "client_iterator_wait": round(t_next / n, 4),
            "client_device_put": round(t_put / n, 4),
            "client_step_dispatch": round(t_disp / n, 4),
            "tail_sync": round(t_sync, 4),
            "device_residual_per_batch": round(wall / n - dev_s, 4),
            "e2e_fps_this_epoch": round(n * args.batch / wall, 2),
            "device_ceiling_fps": round(args.batch / dev_s, 2),
        }))
    fps = []
    for e in range(1, args.epochs + 1):
        wall, n, loss = run_epoch(e)
        fps.append(n * args.batch / wall)
        print(f"epoch {e}: {wall:.2f}s, {fps[-1]:.1f} frames/s "
              f"(loss {loss:.3f})", file=sys.stderr)
    fps.sort()
    med = fps[len(fps) // 2]
    print(json.dumps({
        "metric": "end-to-end train frames/sec (pipeline + device)",
        "host_vox": args.host_vox, "host_targets": args.host_targets,
        "batch": args.batch,
        "value": round(med, 2),
        "runs": [round(f, 2) for f in fps]}))


if __name__ == "__main__":
    main()
