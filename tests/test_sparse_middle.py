"""Equivalence tests for the sparse block-1 middle lowering
(models/middle.py backend='sparse1', models/sparse_conv.py): block 1
computed input-stationarily off the (B, K, C) occupied-voxel table —
one (C -> 27*Cout) matmul + 27 unique-index scatter-adds — must match
scatter_to_dense + Conv3D exactly (same parameter tree), in eval and
train mode, values and gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.middle import MiddleLayers
from voxelnet_tpu.models.scatter import scatter_to_dense
from voxelnet_tpu.models.sparse_conv import sparse_conv3x3

D, H, W, C, K, B = 10, 8, 8, 16, 48, 2


def _table(seed=0, k=K):
    """Random sparse voxel table with unique coords per frame."""
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(B, k, C)).astype(np.float32)
    coords = np.zeros((B, k, 3), np.int32)
    counts = np.zeros((B, k), np.int32)
    for b in range(B):
        lin = rng.choice(D * H * W, size=k, replace=False)
        lin.sort()
        coords[b, :, 0] = lin // (H * W)
        coords[b, :, 1] = (lin // W) % H
        coords[b, :, 2] = lin % W
        live = int(rng.integers(k // 2, k + 1))
        counts[b, :live] = 1
    feats[counts == 0] = 0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(counts)


@pytest.mark.parametrize("stride_d,pad_d", [(2, 1), (1, 0)])
def test_sparse_conv_matches_dense_conv(stride_d, pad_d):
    feats, coords, counts = _table()
    rng = np.random.default_rng(3)
    kernel = jnp.asarray(
        rng.normal(size=(3, 3, 3, C, 8)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    dense = scatter_to_dense(feats, coords, counts, (D, H, W))
    ref = jax.lax.conv_general_dilated(
        dense, kernel, window_strides=(stride_d, 1, 1),
        padding=((pad_d, pad_d), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias

    got = sparse_conv3x3(feats, coords, counts, kernel, bias,
                         (D, H, W), stride_d, pad_d)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sparse_conv_empty_rf_sites_equal_bias():
    """A frame with zero live voxels must output exactly bias."""
    feats, coords, counts = _table(seed=1)
    counts = counts.at[1].set(0)
    rng = np.random.default_rng(4)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, C, 8)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    out = sparse_conv3x3(feats, coords, counts, kernel, bias,
                         (D, H, W), 2, 1)
    np.testing.assert_array_equal(
        np.asarray(out[1]), np.broadcast_to(np.asarray(bias), out[1].shape))


@pytest.fixture(scope="module")
def table():
    return _table()


@pytest.fixture(scope="module")
def variables(table):
    feats, coords, counts = table
    dense = scatter_to_dense(feats, coords, counts, (D, H, W))
    return MiddleLayers(dtype=jnp.float32).init(jax.random.key(0), dense)


def test_param_trees_identical(table, variables):
    sp = MiddleLayers(dtype=jnp.float32, backend="sparse1", depth_in=D,
                      grid_hw=(H, W)).init(jax.random.key(0), table)
    assert jax.tree.map(jnp.shape, sp) == jax.tree.map(jnp.shape, variables)


def test_eval_and_train_equivalence(table, variables):
    feats, coords, counts = table
    dense = scatter_to_dense(feats, coords, counts, (D, H, W))
    y3 = MiddleLayers(dtype=jnp.float32).apply(variables, dense, False)
    ys = MiddleLayers(dtype=jnp.float32, backend="sparse1", depth_in=D,
                      grid_hw=(H, W)).apply(variables, table, False)
    assert y3.shape == ys.shape == (B, H, W, 128)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(ys),
                               rtol=1e-4, atol=1e-4)

    y3t, m3 = MiddleLayers(dtype=jnp.float32).apply(
        variables, dense, True, mutable=["batch_stats"])
    yst, ms = MiddleLayers(dtype=jnp.float32, backend="sparse1",
                           depth_in=D, grid_hw=(H, W)).apply(
        variables, table, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y3t), np.asarray(yst),
                               rtol=1e-4, atol=1e-4)
    flat3 = jax.tree_util.tree_leaves_with_path(m3["batch_stats"])
    flats = dict(jax.tree_util.tree_leaves_with_path(ms["batch_stats"]))
    assert len(flat3) == 6
    for path, leaf in flat3:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flats[path]),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))


def test_grads_match_dense_path(table, variables):
    """d(sum(middle))/d(params, feats) agree between the sparse and
    dense lowerings — the train step's backward is exact too."""
    feats, coords, counts = table
    mid3 = MiddleLayers(dtype=jnp.float32)
    mids = MiddleLayers(dtype=jnp.float32, backend="sparse1", depth_in=D,
                        grid_hw=(H, W))

    def loss3(params, f):
        dense = scatter_to_dense(f, coords, counts, (D, H, W))
        y, _ = mid3.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          dense, True, mutable=["batch_stats"])
        return (y * y).sum()

    def losss(params, f):
        y, _ = mids.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          (f, coords, counts), True,
                          mutable=["batch_stats"])
        return (y * y).sum()

    g3 = jax.grad(loss3, argnums=(0, 1))(variables["params"], feats)
    gs = jax.grad(losss, argnums=(0, 1))(variables["params"], feats)
    for a, b in zip(jax.tree.leaves(g3), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_full_model_sparse1_equivalence(tiny_config, tiny_batch):
    """Whole VoxelNet forward agrees between conv3d and sparse1 (which
    never builds the C-channel dense grid) on the tiny grid."""
    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg3 = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="conv3d"))
    cfgs = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="sparse1"))
    variables = init_params(cfg3, jax.random.key(0))
    spec = VoxelGridSpec.from_object_config(tiny_config.object)
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec,
        tiny_config.data.max_voxels, "xla")
    outs = {}
    for name, cfg in (("conv3d", cfg3), ("sparse1", cfgs)):
        model = build_model(cfg)
        assert model.middle_backend == name
        outs[name] = model.apply(variables, vox.features, vox.coords,
                                 vox.counts, train=False)
    for a, b in zip(outs["conv3d"], outs["sparse1"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)


def test_sparse1_spatial_sharding_matches_unsharded(tiny_config,
                                                    tiny_batch):
    """sparse1 under W-axis 'model' sharding: block-1's shard_map
    computes each shard's W slab halo-free from the replicated voxel
    table (sparse_conv3x3_sharded); the full forward must match the
    unsharded sparse1 (and thus conv3d) graph."""
    import jax.numpy as jnp

    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax
    from voxelnet_tpu.parallel import make_mesh

    cfg = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="sparse1"))
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)

    plain = build_model(cfg)
    out_plain = jax.jit(
        lambda v, f, c, n: plain.apply(v, f, c, n, train=False)
    )(variables, vox.features, vox.coords, vox.counts)

    cfg_sharded = cfg.replace(system=dataclasses.replace(
        cfg.system, num_data_shards=2, num_model_shards=2))
    sharded = build_model(cfg_sharded)
    assert sharded.middle_backend == "sparse1" and sharded.num_model == 2
    mesh = make_mesh(num_data=2, num_model=2)
    with jax.set_mesh(mesh):
        out_sharded = jax.jit(
            lambda v, f, c, n: sharded.apply(v, f, c, n, train=False)
        )(variables, vox.features, vox.coords, vox.counts)

    np.testing.assert_allclose(np.asarray(out_plain[0]),
                               np.asarray(out_sharded[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_plain[1]),
                               np.asarray(out_sharded[1]), atol=2e-2)


def test_sparse_conv_w_window_covers_grid():
    """Concatenating per-window outputs reproduces the full-grid conv
    (the spatial-sharding unit, without a mesh)."""
    feats, coords, counts = _table(seed=5)
    rng = np.random.default_rng(6)
    kernel = jnp.asarray(
        rng.normal(size=(3, 3, 3, C, 8)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    full = sparse_conv3x3(feats, coords, counts, kernel, bias,
                          (D, H, W), 2, 1)
    parts = [sparse_conv3x3(feats, coords, counts, kernel, bias,
                            (D, H, W), 2, 1, w_window=(x0, W // 4))
             for x0 in range(0, W, W // 4)]
    np.testing.assert_allclose(np.asarray(jnp.concatenate(parts, axis=3)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)


def test_fused_vfe_feeds_sparse1(tiny_config, tiny_batch):
    """The production inference combo once both backends are selected:
    fused voxelize+VFE kernel (interpret mode on CPU) -> sparse1 middle.
    The kernel's (voxelwise, coords, counts) table is exactly what the
    sparse block-1 consumes; its output must agree with the XLA
    voxelize + dense conv3d middle."""
    import jax.numpy as jnp

    from voxelnet_tpu.kernels.vfe_fused import voxelize_vfe_fused
    from voxelnet_tpu.models.vfe import FeatureLearningNet
    from voxelnet_tpu.models.voxelnet import init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    fln_params = variables["params"]["feature_net"]
    fln_stats = variables["batch_stats"]["feature_net"]
    mid = {"params": variables["params"]["middle"],
           "batch_stats": variables["batch_stats"]["middle"]}
    points = jnp.asarray(tiny_batch["points"])
    num_points = jnp.asarray(tiny_batch["num_points"])
    d, hh, ww = cfg.object.grid_size

    vox = voxelize_batch_jax(points, num_points, spec,
                             cfg.data.max_voxels, "xla")
    vw = FeatureLearningNet(dtype=jnp.bfloat16).apply(
        {"params": fln_params, "batch_stats": fln_stats},
        vox.features, vox.counts, train=False)
    dense = scatter_to_dense(vw, vox.coords, vox.counts, (d, hh, ww))
    want = MiddleLayers(dtype=jnp.bfloat16).apply(mid, dense, False)

    fvw, fcoords, fcounts = voxelize_vfe_fused(
        points, num_points, spec, cfg.data.max_voxels,
        fln_params, fln_stats, block_voxels=64, interpret=True)
    got = MiddleLayers(dtype=jnp.bfloat16, backend="sparse1", depth_in=d,
                       grid_hw=(hh, ww)).apply(
        mid, (fvw, fcoords, fcounts), False)

    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)


# ---- sparsebwd: dense forward, slice-gather backward ----------------------

def test_sparsebwd_forward_is_dense_forward(table, variables):
    """sparsebwd's forward IS the conv3d graph (scatter + dense Conv3D) —
    outputs must be bit-identical in eval and train mode."""
    feats, coords, counts = table
    dense = scatter_to_dense(feats, coords, counts, (D, H, W))
    mid3 = MiddleLayers(dtype=jnp.float32)
    midb = MiddleLayers(dtype=jnp.float32, backend="sparsebwd",
                        depth_in=D, grid_hw=(H, W))
    y3 = mid3.apply(variables, dense, False)
    yb = midb.apply(variables, table, False)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(yb))

    y3t, m3 = mid3.apply(variables, dense, True, mutable=["batch_stats"])
    ybt, mb = midb.apply(variables, table, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y3t), np.asarray(ybt))
    for a, b in zip(jax.tree.leaves(m3), jax.tree.leaves(mb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sparsebwd_param_tree_identical(table, variables):
    sp = MiddleLayers(dtype=jnp.float32, backend="sparsebwd", depth_in=D,
                      grid_hw=(H, W)).init(jax.random.key(0), table)
    assert jax.tree.map(jnp.shape, sp) == jax.tree.map(jnp.shape, variables)


def test_sparsebwd_grads_match_dense_path(table, variables):
    """The custom VJP (27-site slice-gathers + two matmuls) must agree
    with the dense path's autodiff grads for params AND the voxel
    table (summation order differs -> tolerance, f32)."""
    feats, coords, counts = table
    mid3 = MiddleLayers(dtype=jnp.float32)
    midb = MiddleLayers(dtype=jnp.float32, backend="sparsebwd",
                        depth_in=D, grid_hw=(H, W))

    def loss3(params, f):
        dense = scatter_to_dense(f, coords, counts, (D, H, W))
        y, _ = mid3.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          dense, True, mutable=["batch_stats"])
        return (y * jnp.sin(y)).sum()

    def lossb(params, f):
        y, _ = midb.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          (f, coords, counts), True,
                          mutable=["batch_stats"])
        return (y * jnp.sin(y)).sum()

    g3 = jax.grad(loss3, argnums=(0, 1))(variables["params"], feats)
    gb = jax.grad(lossb, argnums=(0, 1))(variables["params"], feats)
    paths3 = jax.tree_util.tree_leaves_with_path(g3)
    leavesb = jax.tree.leaves(gb)
    assert len(paths3) == len(leavesb)
    for (path, a), b in zip(paths3, leavesb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=str(path))


def test_sparsebwd_grad_zero_for_dead_rows(table, variables):
    """Padding rows of the voxel table must receive zero cotangent."""
    feats, coords, counts = table
    midb = MiddleLayers(dtype=jnp.float32, backend="sparsebwd",
                        depth_in=D, grid_hw=(H, W))

    def lossb(f):
        y = midb.apply(variables, (f, coords, counts), False)
        return (y * y).sum()

    g = jax.grad(lossb)(feats)
    dead = np.asarray(counts) == 0
    assert dead.any()
    np.testing.assert_array_equal(np.asarray(g)[dead], 0.0)


def test_full_model_sparsebwd_equivalence(tiny_config, tiny_batch):
    """Whole VoxelNet forward agrees bit-for-bit between conv3d and
    sparsebwd (identical forward graph), and one train-step's grads
    agree to tolerance."""
    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg3 = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="conv3d"))
    cfgb = tiny_config.replace(data=dataclasses.replace(
        tiny_config.data, middle_backend="sparsebwd"))
    variables = init_params(cfg3, jax.random.key(0))
    spec = VoxelGridSpec.from_object_config(tiny_config.object)
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec,
        tiny_config.data.max_voxels, "xla")
    feats, coords, counts = vox.features, vox.coords, vox.counts
    m3, mb = build_model(cfg3), build_model(cfgb)
    y3c, y3r = m3.apply(variables, feats, coords, counts, train=False)
    ybc, ybr = mb.apply(variables, feats, coords, counts, train=False)
    np.testing.assert_array_equal(np.asarray(y3c), np.asarray(ybc))
    np.testing.assert_array_equal(np.asarray(y3r), np.asarray(ybr))

    def loss(model, params):
        (c, r), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            feats, coords, counts, train=True, mutable=["batch_stats"])
        return (jnp.asarray(c, jnp.float32) ** 2).mean() + (
            jnp.asarray(r, jnp.float32) ** 2).mean()

    g3 = jax.grad(lambda p: loss(m3, p))(variables["params"])
    gb = jax.grad(lambda p: loss(mb, p))(variables["params"])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g3),
                            jax.tree.leaves(gb)):
        keys = [getattr(k, "key", "") for k in path]
        if keys[-3:] == ["ConvBlock3D_0", "Conv_0", "bias"]:
            # block-1 conv bias precedes train-mode BN: a constant
            # per-channel shift cancels in the normalization, so the
            # true grad is 0 and both paths emit only bf16
            # summation noise (computed differently on each side).
            # Only boundedness is meaningful here.
            assert np.abs(np.asarray(a)).max() < 0.5, str(path)
            assert np.abs(np.asarray(b)).max() < 0.5, str(path)
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=1e-4, err_msg=str(path))
