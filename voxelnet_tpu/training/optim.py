"""Optimizer + LR schedule.

Reference: SGD(lr=0.01) + MultiStepLR dropping 10x at epoch 150, gradient
clipping at global-norm 5 (voxelnet/train.py:130-132, 153). Rebuilt as an
optax chain with a step-based piecewise-constant schedule.
"""

from __future__ import annotations

import optax

from voxelnet_tpu.config import VoxelNetConfig


def make_lr_schedule(config: VoxelNetConfig, steps_per_epoch: int):
    boundary = config.train.lr_scheduler_step * max(steps_per_epoch, 1)
    return optax.piecewise_constant_schedule(
        init_value=config.train.lr,
        boundaries_and_scales={boundary: 0.1},
    )


def make_optimizer(config: VoxelNetConfig,
                   steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.train.gradient_clip),
        optax.sgd(make_lr_schedule(config, steps_per_epoch)),
    )
