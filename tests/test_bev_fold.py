"""Equivalence tests for data.bev_fold='dsplit': absorbing the c-major
depth->BEV fold (reference voxelnet/model.py:262) into the first RPN
conv's kernel (rpn._BEVFoldConv) must reproduce the explicit fold
transpose exactly — same parameter tree, same logits — so the two modes
are checkpoint-interchangeable."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.voxelnet import (build_model, init_params,
                                          resolve_bev_fold)
from voxelnet_tpu.ops.voxelize import (VoxelGridSpec, resolve_backend,
                                       voxelize_batch_jax)


def _cfg(tiny_config, mode, dtype=None):
    cfg = dataclasses.replace(
        tiny_config,
        data=dataclasses.replace(tiny_config.data, bev_fold=mode))
    if dtype is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, compute_dtype=dtype))
    return cfg


@pytest.fixture(scope="module")
def vox(tiny_config, tiny_batch):
    spec = VoxelGridSpec.from_object_config(tiny_config.object)
    v = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec,
        tiny_config.data.max_voxels,
        resolve_backend(tiny_config.data.voxelizer_backend))
    return v.features, v.coords, v.counts


def test_param_tree_identical(tiny_config):
    va = init_params(_cfg(tiny_config, "transpose"), jax.random.key(0))
    vb = init_params(_cfg(tiny_config, "dsplit"), jax.random.key(0))
    ta = jax.tree_util.tree_structure(va)
    tb = jax.tree_util.tree_structure(vb)
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(va),
                    jax.tree_util.tree_leaves(vb)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("train,dtype,atol", [
    # eval, production bf16: summation-order flips only — the torch
    # full-stack parity bound
    (False, None, 2e-3),
    # train mode normalizes by BATCH variance, amplifying bf16
    # order-of-summation diffs ~10x — float32 shows the math is exact
    (True, "float32", 1e-4),
    (False, "float32", 1e-4),
])
def test_logits_match_fold_transpose(tiny_config, vox, train, dtype, atol):
    feats, coords, counts = vox
    variables = init_params(_cfg(tiny_config, "transpose", dtype),
                            jax.random.key(1))
    outs = {}
    for mode in ("transpose", "dsplit"):
        model = build_model(_cfg(tiny_config, mode, dtype))
        if train:
            (cls, reg), _ = model.apply(
                variables, feats, coords, counts, train=True,
                mutable=["batch_stats"])
        else:
            cls, reg = model.apply(variables, feats, coords, counts,
                                   train=False)
        outs[mode] = (np.asarray(cls), np.asarray(reg))
    for a, b in zip(outs["transpose"], outs["dsplit"]):
        np.testing.assert_allclose(a, b, atol=atol, rtol=atol)


def test_resolve_rules(tiny_config):
    assert resolve_bev_fold(_cfg(tiny_config, "transpose")) == "transpose"
    assert resolve_bev_fold(_cfg(tiny_config, "dsplit")) == "dsplit"
    # 'auto' off-TPU keeps the explicit transpose
    assert resolve_bev_fold(_cfg(tiny_config, "auto")) == "transpose"
    with pytest.raises(ValueError, match="bev_fold"):
        resolve_bev_fold(_cfg(tiny_config, "nope"))
    folded = dataclasses.replace(
        tiny_config, data=dataclasses.replace(
            tiny_config.data, bev_fold="dsplit",
            middle_backend="folded2d"))
    with pytest.raises(ValueError, match="folded2d"):
        resolve_bev_fold(folded)


def test_dsplit_spatial_sharding_matches_unsharded(tiny_config, vox):
    """dsplit under W-axis 'model' sharding: the 5D bev constraint branch
    (models/voxelnet.py) + the depth-slice convs must match the
    unsharded dsplit forward (XLA halo exchanges)."""
    from voxelnet_tpu.parallel import make_mesh

    feats, coords, counts = vox
    cfg = _cfg(tiny_config, "dsplit")
    variables = init_params(cfg, jax.random.key(2))
    plain = build_model(cfg)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, feats, coords, counts)

    cfg_sharded = cfg.replace(system=cfg.system.__class__(
        **{**cfg.system.__dict__, "num_data_shards": 2,
           "num_model_shards": 2}))
    sharded = build_model(cfg_sharded)
    mesh = make_mesh(num_data=2, num_model=2)
    with jax.set_mesh(mesh):
        out_sharded = jax.jit(
            lambda v, f, c, n: sharded.apply(v, f, c, n, train=False)
        )(variables, feats, coords, counts)
    for a, b in zip(out_plain, out_sharded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2)


def test_yaml_roundtrip(tmp_path):
    from voxelnet_tpu.config import get_config

    p = tmp_path / "cfg.yaml"
    p.write_text("data: {bev_fold: dsplit}\n")
    cfg = get_config("Car").merge_from_file(str(p))
    assert cfg.data.bev_fold == "dsplit"
    dumped = tmp_path / "snap.yaml"
    dumped.write_text(cfg.dump_yaml())
    assert get_config("Car").merge_from_file(
        str(dumped)).data.bev_fold == "dsplit"
