"""Eval-time BN folding (models/bn_fold.py) equivalence tests.

The folded graph (BN affine absorbed into conv kernels/biases, BN ops
skipped) must match the unfolded eval graph on every middle lowering.
BN params/stats are randomized first — a fresh init (scale=1, mean=0,
var=1) would make the fold trivially identity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.bn_fold import assert_foldable, fold_bn_variables
from voxelnet_tpu.models.voxelnet import build_model, init_params
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax


def _randomize_bn(variables, seed=0):
    """Non-trivial BN params + running stats, deterministic."""
    rng = np.random.default_rng(seed)

    def walk(node, in_bn, kind):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, in_bn or "BatchNorm" in k or k == "bn",
                              kind)
            elif kind == "stats" and k == "mean":
                out[k] = jnp.asarray(
                    rng.normal(0.0, 0.5, v.shape), v.dtype)
            elif kind == "stats" and k == "var":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 2.0, v.shape), v.dtype)
            elif kind == "params" and in_bn and k == "scale":
                out[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, v.shape), v.dtype)
            elif kind == "params" and in_bn and k == "bias":
                out[k] = jnp.asarray(
                    rng.normal(0.0, 0.3, v.shape), v.dtype)
            else:
                out[k] = v
        return out

    return {"params": walk(variables["params"], False, "params"),
            "batch_stats": walk(variables["batch_stats"], False, "stats")}


def _voxels(cfg, tiny_batch):
    spec = VoxelGridSpec.from_object_config(cfg.object)
    return voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)


@pytest.mark.parametrize("middle,bev_fold", [
    ("conv3d", "transpose"),
    ("wpack2", "dsplit"),      # the TPU production graph
    ("folded2d", "transpose"),
])
def test_fold_matches_unfolded(tiny_config, tiny_batch, middle, bev_fold):
    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend=middle, bev_fold=bev_fold))
    variables = _randomize_bn(init_params(cfg, jax.random.key(0)))
    vox = _voxels(cfg, tiny_batch)

    plain = build_model(cfg)
    folded = build_model(cfg, fold_bn=True)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, vox.features, vox.coords, vox.counts)
    out_fold = jax.jit(
        lambda v, f, c, n: folded.apply(v, f, c, n, train=False)
    )(fold_bn_variables(variables), vox.features, vox.coords, vox.counts)

    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_fold[0]), atol=5e-2)
    np.testing.assert_allclose(np.asarray(out_plain[1]),
                               np.asarray(out_fold[1]), atol=5e-2)


def test_fold_count(tiny_config):
    """3 middle BNs + 20 RPN BNs (17 convs + 3 deconvs) must fold."""
    variables = init_params(tiny_config, jax.random.key(0))
    assert assert_foldable(variables) == 23


def test_inference_fn_folds_by_default(tiny_config, tiny_batch):
    """make_inference_fn: data.fold_bn 'auto' (on) vs 'off' agree."""
    from voxelnet_tpu.models.voxelnet import make_inference_fn

    cfg_off = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, fold_bn="off"))
    variables = _randomize_bn(init_params(tiny_config, jax.random.key(0)))
    pts = jnp.asarray(tiny_batch["points"])
    num = jnp.asarray(tiny_batch["num_points"])

    det_on = jax.jit(make_inference_fn(tiny_config))(variables, pts, num)
    det_off = jax.jit(make_inference_fn(cfg_off))(variables, pts, num)
    # detections: same kept set, near-identical scores
    assert (np.asarray(det_on.valid) == np.asarray(det_off.valid)).all()
    np.testing.assert_allclose(np.asarray(det_on.scores),
                               np.asarray(det_off.scores), atol=2e-2)


def test_train_graph_ignores_fold(tiny_config, tiny_batch):
    """fold_bn=True with train=True still applies live-BN (the flag is
    eval-only) — outputs match the plain train graph."""
    cfg = tiny_config
    variables = _randomize_bn(init_params(cfg, jax.random.key(0)))
    vox = _voxels(cfg, tiny_batch)

    plain = build_model(cfg)
    folded = build_model(cfg, fold_bn=True)
    out_p, _ = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=True,
                                       mutable=["batch_stats"])
    )(variables, vox.features, vox.coords, vox.counts)
    out_f, _ = jax.jit(
        lambda v, f, c, n: folded.apply(v, f, c, n, train=True,
                                        mutable=["batch_stats"])
    )(variables, vox.features, vox.coords, vox.counts)
    np.testing.assert_allclose(np.asarray(out_p[0]), np.asarray(out_f[0]),
                               atol=1e-5)
