"""Training CLI.

Usage parity with the reference `python train.py` (voxelnet/train.py:30-44)
plus working --resume (the reference raises NotImplementedError).

    python -m voxelnet_tpu.cli.train --data-dir /data/kitti/MD_KITTI \
        [--cfg overrides.yaml] [--class-name Car] [--resume exps/.../checkpoints]
"""

from __future__ import annotations

import argparse
import os


def _apply_platform_override():
    """VOXELNET_PLATFORM=cpu forces the JAX backend. Needed because some
    TPU plugins ignore JAX_PLATFORMS, and a single chip is exclusive to one
    process — CPU runs let tooling work alongside a training job."""
    plat = os.environ.get("VOXELNET_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


_apply_platform_override()


def _maybe_init_distributed():
    """Multi-host entry: when VOXELNET_COORDINATOR (+ NUM_PROCESSES /
    PROCESS_ID) is set, start the JAX distributed runtime before any other
    backend use (parallel/distributed.py)."""
    if os.environ.get("VOXELNET_COORDINATOR"):
        from voxelnet_tpu.parallel import distributed

        distributed.initialize()


_maybe_init_distributed()

from voxelnet_tpu.config import get_config
from voxelnet_tpu.training.trainer import Trainer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", type=str, default=None,
                   help="KITTI root containing training/ and validation/")
    p.add_argument("--cfg", type=str, default=None,
                   help="YAML config override file")
    p.add_argument("--class-name", type=str, default="Car",
                   choices=("Car", "Pedestrian", "Cyclist", "all"),
                   help="'all' trains one model per class sequentially "
                        "(multi-class coverage; the reference supports one "
                        "class per process, voxelnet/config.py:37)")
    p.add_argument("--exp-base", type=str, default="exps")
    p.add_argument("--exp-dir", type=str, default=None,
                   help="explicit experiment dir (required for multi-host "
                        "runs so all processes share one dir)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--print-interval", type=int, default=100)
    p.add_argument("--summary-interval", type=int, default=100)
    p.add_argument("--summary-val-interval", type=int, default=100)
    p.add_argument("--profile-steps", type=str, default=None,
                   help="START:STOP global-step window traced with "
                        "jax.profiler into the exp logs dir")
    p.add_argument("--num-vis-dump", type=int, default=0,
                   help="per-epoch front/BEV/heatmap JPEG triplets to dump "
                        "(reference default 50, voxelnet/train.py:39)")
    args = p.parse_args(argv)

    classes = (("Car", "Pedestrian", "Cyclist")
               if args.class_name == "all" else (args.class_name,))
    profile_steps = None
    if args.profile_steps:
        a, b = args.profile_steps.split(":")
        profile_steps = (int(a), int(b))

    from dataclasses import replace

    for cls_name in classes:
        config = get_config(cls_name)
        if args.cfg:
            config = config.merge_from_file(args.cfg)
        if args.data_dir:
            config = replace(
                config, data=replace(config.data, dir=args.data_dir))
        print(config.dump_yaml())

        with Trainer(
            config,
            train_dir=os.path.join(config.data.dir, "training"),
            val_dir=os.path.join(config.data.dir, "validation"),
            exp_base=(args.exp_base if len(classes) == 1
                      else os.path.join(args.exp_base, cls_name)),
            resume_from=args.resume,
            # a shared explicit exp dir across classes would overwrite
            # checkpoints/preds; give each class its own subdir
            exp_dir=(args.exp_dir if args.exp_dir is None
                     or len(classes) == 1
                     else os.path.join(args.exp_dir, cls_name)),
        ) as trainer:
            trainer.train(
                print_interval=args.print_interval,
                summary_interval=args.summary_interval,
                val_interval=args.summary_val_interval,
                profile_steps=profile_steps,
                num_vis_dump=args.num_vis_dump,
            )


if __name__ == "__main__":
    main()
