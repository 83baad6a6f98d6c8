"""Equivalence tests for the folded-2D middle-conv lowering
(models/middle.py backend='folded2d'): each Conv3D computed as one
block-banded Conv2D with depth folded into channels — same parameter
tree, same math as the conv3d backend, so the two must agree to float
tolerance in eval AND train mode (including running-stat updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.middle import MiddleLayers
from voxelnet_tpu.models.scatter import (
    scatter_to_dense, scatter_to_dense_folded)

D, H, W, C = 10, 8, 8, 16


@pytest.fixture(scope="module")
def x5d():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, D, H, W, C)).astype(np.float32)
    # sparse-ish like the real grid: zero out 90% of the voxels
    mask = rng.random((2, D, H, W, 1)) < 0.1
    return jnp.asarray(x * mask)


@pytest.fixture(scope="module")
def variables(x5d):
    return MiddleLayers(dtype=jnp.float32).init(jax.random.key(0), x5d)


def test_param_trees_identical(x5d, variables):
    folded = MiddleLayers(dtype=jnp.float32, backend="folded2d").init(
        jax.random.key(0), x5d)
    ref_shapes = jax.tree.map(jnp.shape, variables)
    fold_shapes = jax.tree.map(jnp.shape, folded)
    assert ref_shapes == fold_shapes


def test_eval_equivalence(x5d, variables):
    y3 = MiddleLayers(dtype=jnp.float32).apply(variables, x5d, False)
    for backend in ("folded2d", "tap2d", "wpack", "wpack2"):
        yf = MiddleLayers(dtype=jnp.float32, backend=backend).apply(
            variables, x5d, False)
        assert y3.shape == yf.shape == (2, H, W, 128)
        np.testing.assert_allclose(np.asarray(y3), np.asarray(yf),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=backend)


def test_eval_equivalence_4d_input(x5d, variables):
    """The (B, H, W, D*C) d-major input path (scatter_to_dense_folded's
    layout) must match the 5D path."""
    b = x5d.shape[0]
    x4d = x5d.transpose(0, 2, 3, 1, 4).reshape(b, H, W, D * C)
    y3 = MiddleLayers(dtype=jnp.float32).apply(variables, x5d, False)
    yf = MiddleLayers(dtype=jnp.float32, backend="folded2d",
                      depth_in=D).apply(variables, x4d, False)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(yf),
                               rtol=1e-4, atol=1e-4)


def test_train_equivalence_including_batch_stats(x5d, variables):
    y3, m3 = MiddleLayers(dtype=jnp.float32).apply(
        variables, x5d, True, mutable=["batch_stats"])
    flat3 = jax.tree_util.tree_leaves_with_path(m3["batch_stats"])
    assert len(flat3) == 6  # 3 blocks x (mean, var)
    for backend in ("folded2d", "tap2d", "wpack", "wpack2"):
        yf, mf = MiddleLayers(dtype=jnp.float32, backend=backend).apply(
            variables, x5d, True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y3), np.asarray(yf),
                                   rtol=1e-4, atol=1e-4, err_msg=backend)
        flatf = dict(jax.tree_util.tree_leaves_with_path(
            mf["batch_stats"]))
        for path, leaf in flat3:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flatf[path]),
                rtol=1e-4, atol=1e-5, err_msg=f"{backend} {path}")


def test_wpack_vjp_matches_the_conv3d_vjp():
    """wpack's custom VJP picks each transpose's formulation by
    measurement (paired grad-input everywhere; paired grad-weight for
    the equal-channel blocks, dense for the widening block). All
    formulations compute the same math, so given identical inputs and
    cotangent, dx/dw must match the conv3d VJP to f32 rounding."""
    from voxelnet_tpu.models.middle import _conv3d_raw, _wpack_conv3d

    rng = np.random.default_rng(0)
    din = 10
    for cin, cout, sd, pd in ((16, 8, 2, 1), (8, 8, 1, 0), (8, 8, 2, 1)):
        x = jnp.asarray(rng.normal(size=(2, din, 8, 8, cin)).astype(
            np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)).astype(
            np.float32))
        y1, vjp1 = jax.vjp(lambda x_, w_: _conv3d_raw(x_, w_, sd, pd), x, w)
        y2, vjp2 = jax.vjp(lambda x_, w_: _wpack_conv3d(x_, w_, sd, pd),
                           x, w)
        # the paired (.., W/2, 2*Cout) output is a row-major relabeling
        np.testing.assert_allclose(np.asarray(y1),
                                   np.asarray(y2).reshape(y1.shape),
                                   rtol=1e-5, atol=1e-4)
        g = jnp.asarray(rng.normal(size=y1.shape).astype(np.float32))
        for a, b in zip(vjp1(g), vjp2(g.reshape(y2.shape))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-3)
        din = (din + 2 * pd - 3) // sd + 1


def test_wpack_grads_match_conv3d(x5d, variables):
    """Stack-level gradient agreement (loose: forward summation-order
    noise is amplified through the BatchNorm batch statistics — the
    bitwise VJP check above is the strong form)."""
    def loss(backend, params, x):
        y = MiddleLayers(dtype=jnp.float32, backend=backend).apply(
            params, x, True, mutable=["batch_stats"])[0]
        return jnp.sum(y * y)

    g3p, g3x = jax.grad(lambda p, x: loss("conv3d", p, x),
                        argnums=(0, 1))(variables, x5d)
    gwp, gwx = jax.grad(lambda p, x: loss("wpack", p, x),
                        argnums=(0, 1))(variables, x5d)
    np.testing.assert_allclose(np.asarray(g3x), np.asarray(gwx),
                               rtol=1e-2, atol=1e-3)
    flat3 = dict(jax.tree_util.tree_leaves_with_path(g3p))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gwp):
        np.testing.assert_allclose(np.asarray(flat3[path]),
                                   np.asarray(leaf),
                                   rtol=1e-2, atol=1e-3,
                                   err_msg=str(path))


def test_scatter_folded_matches_fold_of_dense():
    rng = np.random.default_rng(1)
    K = 32
    feats = jnp.asarray(rng.normal(size=(2, K, C)).astype(np.float32))
    coords = jnp.asarray(np.stack([
        rng.integers(0, D, (2, K)), rng.integers(0, H, (2, K)),
        rng.integers(0, W, (2, K))], axis=-1).astype(np.int32))
    counts = jnp.asarray(
        (rng.random((2, K)) < 0.8).astype(np.int32))
    dense = scatter_to_dense(feats, coords, counts, (D, H, W))
    folded = scatter_to_dense_folded(feats, coords, counts, (D, H, W))
    ref = np.asarray(dense).transpose(0, 2, 3, 1, 4).reshape(2, H, W, D * C)
    np.testing.assert_array_equal(ref, np.asarray(folded))


def test_full_model_backend_equivalence(tiny_config, tiny_batch):
    """End-to-end: the whole VoxelNet forward agrees across middle
    backends on the tiny grid (bf16 compute tolerance)."""
    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    import dataclasses

    cfg3 = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="conv3d"))
    cfgf = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="folded2d"))
    variables = init_params(cfg3, jax.random.key(0))
    spec = VoxelGridSpec.from_object_config(tiny_config.object)
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec,
        tiny_config.data.max_voxels, "xla")
    outs = {}
    for name, cfg in (("conv3d", cfg3), ("folded2d", cfgf)):
        model = build_model(cfg)
        assert model.middle_backend == name
        outs[name] = model.apply(variables, vox.features, vox.coords,
                                 vox.counts, train=False)
    for a, b in zip(outs["conv3d"], outs["folded2d"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)
