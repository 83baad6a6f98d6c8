"""Equivalence tests for the planar-T (voxel-major) VFE path:
ops.voxelize.voxelize_planar_t + models.vfe_planar must reproduce the
standard (B, K, T, 7) table + models.vfe.FeatureLearningNet exactly —
same parameter tree, same values/BN-stat updates/gradients in eval and
train mode, both BN semantics — so data.train_vfe_backend='planar' is a
pure speed knob (BASELINE.md: Pallas run-copy table 7.6 vs XLA scatter
29.7 ms/batch8 on v5e)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.config import get_config
from voxelnet_tpu.models.vfe import FeatureLearningNet
from voxelnet_tpu.models.vfe_planar import (PlanarFeatureLearningNet,
                                            planar_point_features)
from voxelnet_tpu.ops.voxelize import (VoxelGridSpec, voxelize_batch_jax,
                                       voxelize_planar_t)


@pytest.fixture(scope="module")
def vox_pair(tiny_config, tiny_batch):
    """Same cloud through both voxelizers: (standard Voxels, planar tab_t,
    coords, counts)."""
    spec = VoxelGridSpec.from_object_config(tiny_config.object)
    K = tiny_config.data.max_voxels
    pts = jnp.asarray(tiny_batch["points"])
    nums = jnp.asarray(tiny_batch["num_points"])
    vox = jax.jit(
        lambda p, n: voxelize_batch_jax(p, n, spec, K, "xla"))(pts, nums)
    tab_t, coords, counts, nv, nvr = jax.jit(
        lambda p, n: voxelize_planar_t(p, n, spec, K, interpret=True)
    )(pts, nums)
    np.testing.assert_array_equal(np.asarray(vox.coords),
                                  np.asarray(coords))
    np.testing.assert_array_equal(np.asarray(vox.counts),
                                  np.asarray(counts))
    np.testing.assert_array_equal(np.asarray(vox.num_voxels),
                                  np.asarray(nv))
    return vox, tab_t, coords, counts


def test_planar_features_match_finalize(vox_pair):
    """planar_point_features == _finalize's feature build (transposed)."""
    vox, tab_t, _, counts = vox_pair
    feat, mask = planar_point_features(tab_t, jnp.asarray(counts))
    # (B, 7, T, K) -> (B, K, T, 7)
    got = np.asarray(feat).transpose(0, 3, 2, 1)
    np.testing.assert_allclose(got, np.asarray(vox.features),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bn_over_padding", [False, True])
def test_param_tree_identical(bn_over_padding):
    std = FeatureLearningNet(dtype=jnp.float32,
                             bn_over_padding=bn_over_padding)
    pla = PlanarFeatureLearningNet(dtype=jnp.float32,
                                   bn_over_padding=bn_over_padding)
    T = 35
    vs = std.init(jax.random.key(0),
                  jnp.zeros((1, 1, T, 7)), jnp.zeros((1, 1), jnp.int32))
    vp = pla.init(jax.random.key(0),
                  jnp.zeros((1, 4, T, 1)), jnp.zeros((1, 1), jnp.int32))
    assert jax.tree.map(jnp.shape, vs) == jax.tree.map(jnp.shape, vp)


@pytest.mark.parametrize("bn_over_padding", [False, True])
def test_forward_matches_standard(vox_pair, bn_over_padding):
    """Eval-mode voxelwise features agree (f32 modules, tight tol)."""
    vox, tab_t, _, counts = vox_pair
    std = FeatureLearningNet(dtype=jnp.float32,
                             bn_over_padding=bn_over_padding)
    pla = PlanarFeatureLearningNet(dtype=jnp.float32,
                                   bn_over_padding=bn_over_padding)
    variables = std.init(jax.random.key(1), vox.features, counts)
    want = std.apply(variables, vox.features, counts, False)
    got = pla.apply(variables, tab_t, counts, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("bn_over_padding", [False, True])
def test_train_mode_outputs_and_bn_stats_match(vox_pair, bn_over_padding):
    vox, tab_t, _, counts = vox_pair
    std = FeatureLearningNet(dtype=jnp.float32,
                             bn_over_padding=bn_over_padding)
    pla = PlanarFeatureLearningNet(dtype=jnp.float32,
                                   bn_over_padding=bn_over_padding)
    variables = std.init(jax.random.key(1), vox.features, counts)
    want, ms = std.apply(variables, vox.features, counts, True,
                         mutable=["batch_stats"])
    got, mp = pla.apply(variables, tab_t, counts, True,
                        mutable=["batch_stats"])
    # bn_over_padding normalizes over ALL B*T*K positions without a
    # mask; flax's E[x^2]-E[x]^2 variance cancels catastrophically for
    # near-dead relu channels, so the two reduction orders drift more
    # than the masked mode (max ~7e-4 observed)
    tol = 2e-3 if bn_over_padding else 1e-4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)
    ls = jax.tree_util.tree_leaves_with_path(ms)
    lp = jax.tree.leaves(mp)
    assert len(ls) == len(lp)
    for (path, a), b in zip(ls, lp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=str(path))


def test_grads_match_standard(vox_pair):
    vox, tab_t, _, counts = vox_pair
    std = FeatureLearningNet(dtype=jnp.float32)
    pla = PlanarFeatureLearningNet(dtype=jnp.float32)
    variables = std.init(jax.random.key(1), vox.features, counts)

    def loss(model, inp, params):
        y, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            inp, counts, True, mutable=["batch_stats"])
        return (y * jnp.sin(y)).sum()

    gs = jax.grad(lambda p: loss(std, vox.features, p))(
        variables["params"])
    gp = jax.grad(lambda p: loss(pla, tab_t, p))(variables["params"])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gs),
                            jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=str(path))


def test_full_train_step_equivalence(tiny_config, tiny_batch):
    """One SGD step with train_vfe_backend='planar' matches 'xla':
    same init, same batch -> same loss and near-identical new params."""
    import optax

    from voxelnet_tpu.training import create_train_state, make_train_step

    tx = optax.sgd(0.01)
    cfg_x = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, train_vfe_backend="xla"))
    cfg_p = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, train_vfe_backend="planar"))
    state_x = create_train_state(cfg_x, tx, jax.random.key(0))
    state_p = create_train_state(cfg_p, tx, jax.random.key(0))
    for a, b in zip(jax.tree.leaves(state_x.params),
                    jax.tree.leaves(state_p.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch = {k: jnp.asarray(v) for k, v in tiny_batch.items()}
    sx, mx = make_train_step(cfg_x, tx, donate=False)(state_x, batch)
    sp, mp = make_train_step(cfg_p, tx, donate=False)(state_p, batch)
    np.testing.assert_allclose(float(mx["loss"]), float(mp["loss"]),
                               rtol=5e-3)
    assert int(mx["voxels_clipped"]) == int(mp["voxels_clipped"])
    for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(sx.params),
            jax.tree.leaves(sp.params)):
        keys = [getattr(k, "key", "") for k in path]
        if keys[0] == "feature_net" and keys[-2:] == ["fcn", "bias"]:
            # a Dense bias feeding relu->train-mode BN has ~zero true
            # gradient (BN's per-channel mean subtraction cancels the
            # shift wherever relu is active), so both paths sum bf16
            # cancellation noise over 17920 positions — only
            # boundedness of the resulting update is meaningful
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       atol=2e-2, err_msg=str(path))
            continue
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-4,
                                   err_msg=str(path))


def test_resolver_guards():
    from voxelnet_tpu.models.voxelnet import resolve_train_vfe_backend

    cfg = get_config("Car", data={"train_vfe_backend": "planar"})
    assert resolve_train_vfe_backend(cfg) == "planar"
    assert resolve_train_vfe_backend(get_config("Car")) == "xla"
    with pytest.raises(ValueError, match="host_voxelize"):
        resolve_train_vfe_backend(get_config(
            "Car", data={"train_vfe_backend": "planar"},
            train={"host_voxelize": True}))
    with pytest.raises(ValueError, match="max_voxels"):
        resolve_train_vfe_backend(get_config(
            "Car", data={"train_vfe_backend": "planar",
                         "max_voxels": 12300}))
    with pytest.raises(ValueError, match="expected"):
        resolve_train_vfe_backend(get_config(
            "Car", data={"train_vfe_backend": "fused"}))


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("data: {train_vfe_backend: planar}\n")
    cfg = get_config("Car").merge_from_file(str(p))
    assert cfg.data.train_vfe_backend == "planar"
    dumped = tmp_path / "snap.yaml"
    dumped.write_text(cfg.dump_yaml())
    assert get_config("Car").merge_from_file(
        str(dumped)).data.train_vfe_backend == "planar"
