"""Capture a jax.profiler device trace of the inference graph and the
training step on real KITTI frames, and write an op-level summary.

The tracing/profiling subsystem the reference lacks entirely (SURVEY.md
§5 — its only instrumentation is wall-clock prints). Usage (TPU chip):

    python scripts/profile_step.py --out profiles/ --stage both

Writes profiles/trace_summary.md: top device ops by total time for each
graph, plus the trace directory for TensorBoard's profile plugin. The
summary is what gets committed; raw traces stay out of git.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_batch(config, batch):
    from bench import load_frames
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec

    # same workload as bench.py / the production pipeline: grid crop
    # before the static cap when data.crop_to_grid (default on)
    spec = (VoxelGridSpec.from_object_config(config.object)
            if config.data.crop_to_grid else None)
    return load_frames(config.data.max_points, batch, spec=spec)[0]


def _sync(out):
    """Force execution with a value fetch: the axon plugin resolves
    futures lazily, so block_until_ready returns before device work is
    done (CLAUDE.md) — only fetching a scalar is a real sync."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])


def _trace_one(tag, fn, args, logdir, iters=3):
    import jax

    # warmup/compile outside the trace
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    with jax.profiler.trace(os.path.join(logdir, tag),
                            create_perfetto_trace=True):
        for _ in range(iters):
            out = fn(*args)
        # device execution is serial per stream, so fetching the last
        # output's value forces all queued iterations to completion
        _sync(out)
    wall = (time.perf_counter() - t0) / iters
    return wall


def _is_module_event(name):
    """XLA module-level events (whole-graph spans) that overlap — and
    would double-count — their child op events: 'jit_fn(…)' aggregates
    plus per-run spans named by bare run id."""
    return name.startswith("jit_") or name.isdigit()


def _parse_trace(trace_dir, iters):
    """Aggregate device-op durations from the chrome-format trace."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device-track pids (TPU/device process names)
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if any(k in pname.lower() for k in ("tpu", "device", "/device")):
                device_pids.add(e.get("pid"))
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    module_ms = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0)) / 1e3 / iters  # us -> ms, per iter
        if _is_module_event(name):
            # `dur` is already raw/iters. A digit-named span covers ONE
            # run (raw == per-iter time, so per-iter = dur * iters); a
            # 'jit_*' row aggregates all runs (per-iter = dur as-is).
            module_ms = max(module_ms,
                            dur * iters if name.isdigit() else dur)
            continue
        agg[name] += dur
        count[name] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    return rows, count, total, module_ms


_NOTABLE = ("convolution", "dot(", "scatter", "gather", "sort",
            "reduce(", "reduce-window", "custom-call", "transpose")


def _hlo_fusion_roots(text):
    """Map fusion/op names -> 'ROOT-op [notable body ops]' of their fused
    computation, from the optimized-HLO text
    (`jit(fn).lower(...).compile().as_text()` — the remote-compile axon
    backend never writes --xla_dump_to files on this host), so the
    trace's opaque 'fusion.N' rows become attributable (conv / dot /
    scatter / …)."""
    roots = {}
    if not text:
        return roots
    # computation body name per fusion instruction
    calls = dict(re.findall(
        r"%?([\w.-]+) = [^\n]*? fusion\([^\n]*?calls=%?([\w.-]+)",
        text))
    # ROOT line + notable op mix of every computation
    comp_root = {}
    comp_ops = defaultdict(list)
    cur = None
    for line in text.splitlines():
        m = re.match(r"%?([\w.-]+) \((?:[^)]*)\) -> ", line)
        if m:
            cur = m.group(1)
            continue
        if not cur:
            continue
        body = line.split("=", 1)[-1].strip() if "=" in line else ""
        if line.lstrip().startswith("ROOT "):
            comp_root[cur] = body.split("(")[0].strip()
        for key in _NOTABLE:
            if key in body:
                comp_ops[cur].append(key.rstrip("("))
                break
    for fus, comp in calls.items():
        if comp in comp_root:
            mix = comp_ops.get(comp, [])
            note = ""
            if mix:
                uniq = sorted(set(mix), key=mix.index)
                note = " [" + "+".join(
                    f"{mix.count(u)}x{u}" if mix.count(u) > 1 else u
                    for u in uniq) + "]"
            roots[fus] = comp_root[comp] + note
    # non-fused named ops attribute to themselves (strip the id suffix)
    return roots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="profiles")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stage", default="both",
                    choices=("infer", "train", "both"))
    ap.add_argument("--host-voxelize", action="store_true",
                    help="train stage: feed pipeline-voxelized buffers "
                         "(the production 36 f/s trainer path) instead of "
                         "raw points — drops the in-graph voxelizer")
    ap.add_argument("--middle-backend", default=None)
    ap.add_argument("--out-md", default="trace_summary.md",
                    help="summary filename under --out (use a distinct "
                         "name for variant configs so the committed "
                         "default-config summary is not clobbered)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from voxelnet_tpu.config import get_config

    overrides = {}
    if args.middle_backend:
        overrides["data"] = {"middle_backend": args.middle_backend}
    config = get_config("Car", **overrides)
    os.makedirs(args.out, exist_ok=True)
    logdir = os.path.join(args.out, "traces")

    pts, nums = _load_batch(config, args.batch)
    pts, nums = jax.device_put(pts), jax.device_put(nums)

    sections = []

    if args.stage in ("infer", "both"):
        from voxelnet_tpu.models.voxelnet import (
            init_params, make_inference_fn)

        variables = init_params(config, jax.random.key(0))
        infer = jax.jit(make_inference_fn(config))
        wall = _trace_one("infer", infer, (variables, pts, nums),
                          logdir, args.iters)
        parsed = _parse_trace(os.path.join(logdir, "infer"), args.iters)
        roots = _hlo_fusion_roots(
            infer.lower(variables, pts, nums).compile().as_text())
        sections.append(("inference (full graph)", wall, parsed, roots))

    if args.stage in ("train", "both"):
        from voxelnet_tpu.training import create_train_state, make_train_step
        from voxelnet_tpu.training.optim import make_optimizer
        from voxelnet_tpu.ops.targets import TargetPrecomputer

        tx = make_optimizer(config, steps_per_epoch=100)
        state = create_train_state(config, tx, jax.random.key(0))
        step = make_train_step(config, tx, donate=False)
        gt = np.zeros((args.batch, config.data.max_gt_boxes, 7), np.float32)
        gt[:, 0] = [20.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
        gt_mask = np.zeros((args.batch, config.data.max_gt_boxes), bool)
        gt_mask[:, 0] = True
        maps = TargetPrecomputer(config)({"gt_boxes": gt,
                                          "gt_mask": gt_mask})
        if args.host_voxelize:
            from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_np

            spec = VoxelGridSpec.from_object_config(config.object)
            pts_h, nums_h = np.asarray(pts), np.asarray(nums)
            feats, crds, cnts = [], [], []
            for b in range(args.batch):
                vox = voxelize_np(pts_h[b, : nums_h[b]], spec,
                                  max_voxels=config.data.max_voxels)
                feats.append(vox.features)
                crds.append(vox.coords)
                cnts.append(vox.counts)
            batch = {
                "voxel_features": jax.device_put(np.stack(feats)),
                "voxel_coords": jax.device_put(np.stack(crds)),
                "voxel_counts": jax.device_put(
                    np.stack(cnts).astype(np.int32)),
                **{k: jax.device_put(v) for k, v in maps.items()}}
        else:
            batch = {"points": pts, "num_points": nums,
                     **{k: jax.device_put(v) for k, v in maps.items()}}

        def train_fn(state, batch):
            new_state, metrics = step(state, batch)
            return metrics["loss"]

        tag = ("train step (fwd+bwd+SGD, host voxels)"
               if args.host_voxelize else "train step (fwd+bwd+SGD)")
        wall = _trace_one("train", train_fn, (state, batch),
                          logdir, args.iters)
        parsed = _parse_trace(os.path.join(logdir, "train"), args.iters)
        try:
            hlo = jax.jit(step).lower(state, batch).compile().as_text()
        except Exception:
            hlo = ""
        sections.append((tag, wall, parsed, _hlo_fusion_roots(hlo)))

    out_md = os.path.join(args.out, args.out_md)
    with open(out_md, "w") as f:
        f.write(f"# jax.profiler device trace summary (batch "
                f"{args.batch}, {args.iters} iters/graph)\n\n"
                f"middle_backend="
                f"{args.middle_backend or config.data.middle_backend}; "
                f"traces under {logdir}/ (not committed).\n")
        for title, wall, parsed, roots in sections:
            f.write(f"\n## {title} (batch {args.batch})\n\n")
            if parsed is None:
                f.write("(no device trace events captured — tunnel "
                        "backend may not export device tracks)\n")
                continue
            rows, count, total, module_ms = parsed
            f.write(f"**device op total {total:.1f} ms/iter** (the "
                    f"authoritative number; matches bench.py's "
                    f"chained-salt timing). Host wall "
                    f"{wall * 1e3:.1f} ms/iter includes ~30-60 ms of "
                    f"tunnel round-trip per value fetch (CLAUDE.md) and "
                    f"is NOT device time. Module span where exported: "
                    f"{module_ms:.1f} ms/iter.\n\n")
            f.write("| op | HLO root | ms/iter | % | calls |\n"
                    "|---|---|---|---|---|\n")
            for name, ms in rows[: args.top]:
                f.write(f"| `{name[:70]}` | "
                        f"{roots.get(name, '')} | {ms:.2f} | "
                        f"{100 * ms / max(total, 1e-9):.1f}% | "
                        f"{count[name]} |\n")
    print(f"wrote {out_md}")
    for title, wall, parsed, _ in sections:
        print(f"{title}: wall {wall * 1e3:.1f} ms/iter, device "
              f"{'n/a' if parsed is None else f'{parsed[3]:.1f} ms module'}")


if __name__ == "__main__":
    main()
