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
BATCH = 4
ITERS = 20


def load_frames(max_points: int, batch: int):
    files = sorted(glob.glob(DATA_GLOB))
    rng = np.random.default_rng(0)
    clouds = []
    if files:
        for f in files[: batch * 4]:
            clouds.append(np.fromfile(f, np.float32).reshape(-1, 4))
    else:  # synthetic fallback
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
            pcl = pcl[rng.permutation(len(pcl))]
            n = min(len(pcl), max_points)
            pts[i, :n] = pcl[:n]
            nums[i] = n
        batches.append((pts, nums))
    return batches


def main():
    import jax
    import jax.numpy as jnp

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.models.voxelnet import init_params, make_inference_fn

    config = get_config("Car")
    variables = init_params(config, jax.random.key(0))
    infer = make_inference_fn(config)

    # Chain a zero-valued salt through iterations so the device executes
    # every step serially and ONE final value fetch closes the pipeline.
    # (On tunneled backends, block_until_ready/per-step fetches measure
    # round-trip latency, not device throughput.)
    @jax.jit
    def chained(variables, p, n, salt):
        det = infer(variables, p + salt, n)
        return det, det.scores.sum() * 0.0

    batches = load_frames(config.data.max_points, BATCH)
    dev_batches = [(jax.device_put(p), jax.device_put(n))
                   for p, n in batches]

    # warmup / compile
    _, salt = chained(variables, *dev_batches[0], jnp.float32(0))
    float(salt)

    salt = jnp.float32(0)
    t0 = time.perf_counter()
    for i in range(ITERS):
        p, n = dev_batches[i % len(dev_batches)]
        _, salt = chained(variables, p, n, salt)
    float(salt)  # forces the whole chain
    elapsed = time.perf_counter() - t0

    fps = BATCH * ITERS / elapsed
    result = {
        "metric": "KITTI frames/sec/chip (Car, inference, full graph "
                  "incl. voxelize+rotated-NMS)",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2) if BASELINE_FPS else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
