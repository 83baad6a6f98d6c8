"""Perf probe: the global-norm gradient-clip chain in the train step.

The r4 train trace (profiles/r4/trace_train_r4.md) attributes 17.2
ms/batch8 — 8.4% of the step — to `fusion.600`, a scalar-rooted
[12xtranspose+reduce] fusion: the global-norm computation over the
gradient leaves (optax.clip_by_global_norm + the CSE'd grad_norm
metric). The clip SEMANTICS (global-norm at 5, reference
voxelnet/train.py:153) don't require transposing every conv gradient:
a per-leaf square-sum in each gradient's native layout feeding one
scalar sum is the same math. This prices the chain and several
formulations end-to-end in the full train step (chained-salt timing,
CLAUDE.md):

  prod          optax.clip_by_global_norm + grad_norm metric (CSE'd)
  noclip        no clip, no metric — the recoverable ceiling
  metric_only   no clip, metric kept — is the norm alone the cost?
  dot           clip, per-leaf norm via full-contraction dot_general
  bf16          clip, per-leaf squares summed in bf16 (f32 accumulate)
  barrier       clip after lax.optimization_barrier on the grads
                (decouples the norm fusion from the backward's layouts)

    python scripts/probe_gradclip.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def _leaf_sq_sums(grads, kind):
    leaves = jax.tree_util.tree_leaves(grads)
    if kind == "dot":
        def sq(g):
            dims = tuple(range(g.ndim))
            return jax.lax.dot_general(
                g, g, ((dims, dims), ((), ())),
                preferred_element_type=jnp.float32)
        return [sq(g) for g in leaves]
    if kind == "bf16":
        return [jnp.sum(jnp.square(g.astype(jnp.bfloat16)),
                        dtype=jnp.float32) for g in leaves]
    return [jnp.sum(jnp.square(g)) for g in leaves]


def clip_variant(max_norm, kind):
    """optax.clip_by_global_norm semantics with a configurable norm
    formulation (same math; layouts/lowerings differ)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g = updates
        if kind == "barrier":
            g = jax.lax.optimization_barrier(g)
        norm = jnp.sqrt(sum(_leaf_sq_sums(g, kind)))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
        return jax.tree.map(lambda u: u * scale, g), state

    return optax.GradientTransformation(init_fn, update_fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.models.voxelnet import build_model
    from voxelnet_tpu.ops import losses
    from voxelnet_tpu.training import create_train_state
    from voxelnet_tpu.training.train_step import (_compute_target_maps,
                                                  _voxelize)
    import bench

    config = get_config("Car")
    model = build_model(config)
    tcfg = config.train
    B = args.batch

    from voxelnet_tpu.ops.voxelize import VoxelGridSpec
    spec = VoxelGridSpec.from_object_config(config.object)
    batches = bench.load_frames(config.data.max_points, B, spec=spec)
    pts, nums = batches[0]
    gt = np.zeros((B, config.data.max_gt_boxes, 7), np.float32)
    gt[:, 0] = [20.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
    gt_mask = np.zeros((B, config.data.max_gt_boxes), bool)
    gt_mask[:, 0] = True
    dev = {
        "points": jax.device_put(pts),
        "num_points": jax.device_put(nums),
        "gt_boxes": jax.device_put(gt),
        "gt_mask": jax.device_put(gt_mask),
    }

    def make_step(tx, with_metric):
        def step_fn(state, batch):
            features, coords, counts, _ = _voxelize(config, batch)
            pos, neg, reg_t = _compute_target_maps(
                config, batch["gt_boxes"], batch["gt_mask"])

            def loss_fn(params):
                (cls_logits, reg), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    features, coords, counts, train=True,
                    mutable=["batch_stats"])
                out = losses.rpn_loss(
                    cls_logits, reg, pos, neg, reg_t,
                    alpha=tcfg.alpha, beta=tcfg.beta, sigma=tcfg.sigma,
                    from_logits=True)
                return out.loss, updates["batch_stats"]

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params,
                batch_stats=new_stats, opt_state=new_opt)
            out = loss
            if with_metric:
                out = out + optax.global_norm(grads) * 0.0
            return new_state, out

        return jax.jit(step_fn, donate_argnums=(0,))

    clip = tcfg.gradient_clip
    sgd = optax.sgd(0.0)  # lr 0: keep weights fixed so runs compare
    variants = {
        "prod": (optax.chain(optax.clip_by_global_norm(clip), sgd), True),
        "noclip": (sgd, False),
        "metric_only": (sgd, True),
        "dot": (optax.chain(clip_variant(clip, "dot"), sgd), True),
        "bf16": (optax.chain(clip_variant(clip, "bf16"), sgd), True),
        "barrier": (optax.chain(clip_variant(clip, "barrier"), sgd), True),
    }
    wanted = (args.variants.split(",") if args.variants
              else list(variants))

    for name in wanted:
        tx, with_metric = variants[name]
        state = create_train_state(config, tx, jax.random.key(0))
        step = make_step(tx, with_metric)

        def run_chain(state):
            salt = jnp.float32(0)
            for _ in range(args.iters):
                batch = dict(dev)
                batch["points"] = dev["points"] + salt
                state, out = step(state, batch)
                salt = out * 0.0
            return state, float(salt)

        state, _ = run_chain(state)  # warmup/compile
        fps_runs = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state, _ = run_chain(state)
            dt = time.perf_counter() - t0
            fps_runs.append(B * args.iters / dt)
        fps = np.mean(fps_runs)
        print(f"{name:12s} {fps:7.2f} f/s "
              f"(ms/batch {1000 * B / fps:7.2f}, "
              f"runs {[round(v, 2) for v in fps_runs]})")


if __name__ == "__main__":
    main()
