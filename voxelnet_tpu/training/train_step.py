"""Jitted train / eval steps.

Contrast with the reference, whose per-iteration path bounces device->host
for NumPy target generation inside `RPN3D.forward` (voxelnet/model.py:309)
and host->device for the masks (model.py:327-332): here ONE jitted graph per
step does voxelize -> VFE -> convs -> on-device targets -> loss -> grads ->
optimizer update, with the batch sharded over the mesh 'data' axis (XLA
inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from voxelnet_tpu.config import VoxelNetConfig
from voxelnet_tpu.models.voxelnet import build_model, init_params
from voxelnet_tpu.ops import anchors as anchor_ops
from voxelnet_tpu.ops import losses, targets as targets_ops
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax
from voxelnet_tpu.parallel import execution_platform


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(config: VoxelNetConfig,
                       tx: optax.GradientTransformation,
                       rng: jax.Array) -> TrainState:
    variables = init_params(config, rng)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
    )


def _compute_target_maps(config: VoxelNetConfig, gt_boxes, gt_mask):
    """vmapped on-device target assignment -> NHWC anchor maps."""
    obj = config.object
    flat_anchors = jnp.asarray(anchor_ops.anchors_flat(obj))
    standup = jnp.asarray(targets_ops.anchor_standup_np(
        obj, buggy=config.compat.buggy_anchor_standup))

    def one(gt_b, gt_m):
        assign = targets_ops.assign_targets(
            gt_b, gt_m, flat_anchors, standup,
            pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
            anchor_h=obj.anchor_h,
            iou_plus_one=config.compat.iou_plus_one,
            yaw_mode=config.train.yaw_encoding)
        return targets_ops.targets_to_maps(
            assign, (obj.feature_height, obj.feature_width))

    return jax.vmap(one)(gt_boxes, gt_mask)


def _voxelize(config: VoxelNetConfig, batch, mesh=None, platform=None):
    """-> (features, coords, counts, voxels_clipped-or-None).

    `features` is the (B, K, T, 7) table on the XLA path, or the RAW
    voxel-major (B, 4, T, K) table when train_vfe_backend resolves to
    'planar' (the model's PlanarFeatureLearningNet masks + featurizes
    it). voxels_clipped is the per-batch count of frames whose
    occupied-voxel count hit the static max_voxels cap (saturation
    telemetry). `platform` keys the backend resolve + Pallas interpret
    choice to the devices that will execute."""
    if "voxel_features" in batch:
        return (batch["voxel_features"], batch["voxel_coords"],
                batch["voxel_counts"], None)
    from voxelnet_tpu.models.voxelnet import resolve_train_vfe_backend
    from voxelnet_tpu.ops.voxelize import dequantize_points_i16

    # train.upload_points='i16q' wire format dequantizes in-graph
    batch = {**batch, "points": dequantize_points_i16(batch["points"])}
    platform = execution_platform(mesh=mesh, platform=platform)
    spec = VoxelGridSpec.from_object_config(config.object)
    if resolve_train_vfe_backend(config, platform) == "planar":
        from voxelnet_tpu.ops.voxelize import (
            voxelize_planar_t, voxelize_planar_t_sharded)

        interpret = platform != "tpu"
        if mesh is None:
            tab_t, coords, counts, _, nvr = voxelize_planar_t(
                batch["points"], batch["num_points"], spec,
                config.data.max_voxels, interpret=interpret)
        else:
            batch_axes = (("dcn", "data") if "dcn" in mesh.axis_names
                          else ("data",))
            tab_t, coords, counts, _, nvr = voxelize_planar_t_sharded(
                batch["points"], batch["num_points"], spec,
                config.data.max_voxels, mesh, batch_axes=batch_axes,
                interpret=interpret)
        clipped = (nvr > config.data.max_voxels).sum()
        return tab_t, coords, counts, clipped
    from voxelnet_tpu.ops.voxelize import resolve_backend

    vox = voxelize_batch_jax(batch["points"], batch["num_points"], spec,
                             config.data.max_voxels,
                             resolve_backend(config.data.voxelizer_backend))
    clipped = (vox.num_voxels_raw > config.data.max_voxels).sum()
    return vox.features, vox.coords, vox.counts, clipped


def make_train_step(config: VoxelNetConfig,
                    tx: optax.GradientTransformation,
                    donate: bool = True, mesh=None):
    """Returns jitted fn(state, batch) -> (state, metrics dict).

    `batch` needs points/num_points (device voxelization) or voxel buffers
    (host voxelization), plus gt_boxes (B, G, 7) and gt_mask (B, G).
    `mesh`: the active device mesh — the planar-T Pallas table build
    shard_maps over its batch axes, and its DEVICES (not the
    process-global default backend) key the backend resolves; without it
    the ambient mesh / default placement decides (execution_platform).
    """
    platform = execution_platform(mesh=mesh)
    model = build_model(config, platform)
    tcfg = config.train

    def step_fn(state: TrainState, batch) -> tuple[TrainState, dict]:
        features, coords, counts, vox_clipped = _voxelize(config, batch,
                                                          mesh, platform)
        if "target_pos" in batch:
            # host-precomputed targets (pipeline threads overlap this work
            # with the previous device step — see dataset.TargetPrecomputer)
            pos, neg, reg_t = (batch["target_pos"], batch["target_neg"],
                               batch["target_reg"])
        else:
            pos, neg, reg_t = _compute_target_maps(
                config, batch["gt_boxes"], batch["gt_mask"])

        def apply_fn(params, batch_stats, features, coords, counts):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                features, coords, counts, train=True,
                mutable=["batch_stats"])

        if tcfg.remat == "seams":
            # save only the named seams (models/voxelnet.py): the dense
            # grid + conv intermediates are recomputed in backward
            apply_fn = jax.checkpoint(
                apply_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "voxelwise", "bev"))
        elif tcfg.remat == "full":
            apply_fn = jax.checkpoint(
                apply_fn, policy=jax.checkpoint_policies.nothing_saveable)
        elif tcfg.remat != "none":
            raise ValueError(
                f"train.remat={tcfg.remat!r} — expected 'none', 'seams' "
                "or 'full'")

        def loss_fn(params):
            (cls_logits, reg), updates = apply_fn(
                params, state.batch_stats, features, coords, counts)
            out = losses.rpn_loss(
                cls_logits, reg, pos, neg, reg_t,
                alpha=tcfg.alpha, beta=tcfg.beta, sigma=tcfg.sigma,
                from_logits=True,
                buggy_smooth_l1=config.compat.buggy_smooth_l1)
            return out.loss, (updates["batch_stats"], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "cls_loss": out.cls_loss,
            "reg_loss": out.reg_loss,
            "cls_pos_loss": out.cls_pos_loss,
            "cls_neg_loss": out.cls_neg_loss,
            "grad_norm": optax.global_norm(grads),
        }
        if vox_clipped is not None:
            metrics["voxels_clipped"] = vox_clipped
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step_fn, donate_argnums=donate_argnums)


def make_eval_step(config: VoxelNetConfig, mesh=None):
    """Jitted fn(state, batch) -> (metrics, cls_probs, reg) for validation."""
    platform = execution_platform(mesh=mesh)
    model = build_model(config, platform)
    tcfg = config.train

    def eval_fn(state: TrainState, batch):
        features, coords, counts, _ = _voxelize(config, batch, mesh,
                                                platform)
        if "target_pos" in batch:
            pos, neg, reg_t = (batch["target_pos"], batch["target_neg"],
                               batch["target_reg"])
        else:
            pos, neg, reg_t = _compute_target_maps(
                config, batch["gt_boxes"], batch["gt_mask"])
        cls_logits, reg = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            features, coords, counts, train=False)
        out = losses.rpn_loss(
            cls_logits, reg, pos, neg, reg_t,
            alpha=tcfg.alpha, beta=tcfg.beta, sigma=tcfg.sigma,
            from_logits=True,
            buggy_smooth_l1=config.compat.buggy_smooth_l1)
        metrics = {"loss": out.loss, "cls_loss": out.cls_loss,
                   "reg_loss": out.reg_loss}
        return metrics, jax.nn.sigmoid(cls_logits), reg

    return jax.jit(eval_fn)
