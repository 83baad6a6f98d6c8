"""Equivalence tests for the fused voxelize+VFE Pallas kernel
(kernels/vfe_fused.py) against the XLA path (voxelize_batch_jax +
flax FeatureLearningNet), interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from voxelnet_tpu.kernels.vfe_fused import voxelize_vfe_fused
from voxelnet_tpu.models.vfe import FeatureLearningNet
from voxelnet_tpu.models.voxelnet import init_params
from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax


def test_fused_matches_xla_path(tiny_config, tiny_batch):
    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    # non-trivial running stats so the BN affine actually does something
    stats = jax.tree.map(
        lambda x: x + 0.3 * jnp.arange(x.size, dtype=x.dtype) / x.size,
        variables["batch_stats"]["feature_net"])

    points = jnp.asarray(tiny_batch["points"])
    num_points = jnp.asarray(tiny_batch["num_points"])

    vox = voxelize_batch_jax(points, num_points, spec,
                             cfg.data.max_voxels, "xla")
    fln = FeatureLearningNet(dtype=jnp.bfloat16)
    want = fln.apply(
        {"params": variables["params"]["feature_net"],
         "batch_stats": stats},
        vox.features, vox.counts, train=False)

    got, coords, counts = voxelize_vfe_fused(
        points, num_points, spec, cfg.data.max_voxels,
        variables["params"]["feature_net"], stats,
        block_voxels=64, interpret=True)

    np.testing.assert_array_equal(np.asarray(coords), np.asarray(vox.coords))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(vox.counts))
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    assert g.shape == w.shape == (points.shape[0], cfg.data.max_voxels, 128)
    # bf16 compute: tolerate rounding, demand structural agreement
    np.testing.assert_allclose(g, w, rtol=0.05, atol=0.05)
    # duplicated-aggregate structure (models/vfe.py final max of concat)
    np.testing.assert_array_equal(g[..., :64], g[..., 64:])
    # occupied voxels produce non-zero features
    occ = np.asarray(counts) > 0
    assert (np.abs(g[occ]).max(axis=-1) > 0).mean() > 0.99


def test_fused_empty_frame(tiny_config):
    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    points = jnp.zeros((1, cfg.data.max_points, 4), jnp.float32)
    got, coords, counts = voxelize_vfe_fused(
        points, jnp.zeros((1,), jnp.int32), spec, cfg.data.max_voxels,
        variables["params"]["feature_net"],
        variables["batch_stats"]["feature_net"],
        block_voxels=64, interpret=True)
    assert np.asarray(counts).sum() == 0
    np.testing.assert_array_equal(np.asarray(got, np.float32), 0.0)


def test_auto_backend_respects_bn_over_padding():
    """'auto' must not route reference ghost-activation semantics
    (compat.bn_over_padding) onto the fused kernel, which implements the
    corrected masked-max semantics only."""
    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.models.voxelnet import resolve_vfe_backend

    cfg = get_config("Car", compat={"bn_over_padding": True})
    assert resolve_vfe_backend(cfg) == "xla"


def test_fused_sharded_matches_unsharded(tiny_config, tiny_batch):
    """shard_map wrapper over ('data',) on the 8-virtual-device CPU mesh
    must be bit-identical to the unsharded kernel (same per-frame math,
    params replicated) — the round-3 un-gating of the fused kernel for
    sharded configs."""
    from voxelnet_tpu.kernels.vfe_fused import voxelize_vfe_fused_sharded
    from voxelnet_tpu.parallel import make_mesh

    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    params = variables["params"]["feature_net"]
    stats = variables["batch_stats"]["feature_net"]

    # 4 frames so a 4-way data shard gives one frame per shard
    points = jnp.tile(jnp.asarray(tiny_batch["points"]), (2, 1, 1))
    num_points = jnp.tile(jnp.asarray(tiny_batch["num_points"]), (2,))

    want, wcoords, wcounts = voxelize_vfe_fused(
        points, num_points, spec, cfg.data.max_voxels, params, stats,
        interpret=True)

    # model axis present: the kernel compute replicates over it untouched
    mesh = make_mesh(num_data=4, num_model=2)
    got, coords, counts = voxelize_vfe_fused_sharded(
        points, num_points, spec, cfg.data.max_voxels, params, stats,
        mesh=mesh, batch_axes=("data",), interpret=True)

    np.testing.assert_array_equal(np.asarray(coords), np.asarray(wcoords))
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(wcounts))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_sharded_inference_fn_fused_backend(tiny_config, tiny_batch):
    """make_inference_fn with a batch-sharded config + fused backend runs
    under the mesh and agrees with the unsharded XLA-backend graph."""
    import dataclasses

    from voxelnet_tpu.models.voxelnet import make_inference_fn
    from voxelnet_tpu.parallel import make_mesh, shard_batch

    cfg = tiny_config
    variables = init_params(cfg, jax.random.key(0))
    points = jnp.tile(jnp.asarray(tiny_batch["points"]), (2, 1, 1))
    num_points = jnp.tile(jnp.asarray(tiny_batch["num_points"]), (2,))

    plain = make_inference_fn(cfg)  # auto -> xla on CPU
    det_plain = jax.jit(plain)(variables, points, num_points)

    cfg_sh = cfg.replace(
        system=dataclasses.replace(cfg.system, num_data_shards=4),
        data=dataclasses.replace(cfg.data, vfe_backend="fused"))
    mesh = make_mesh(num_data=4, num_model=1)
    fn = make_inference_fn(cfg_sh, mesh=mesh)
    with jax.set_mesh(mesh):
        batch = shard_batch(mesh, {"points": np.asarray(points),
                                   "num_points": np.asarray(num_points)})
        det_sh = jax.jit(fn)(variables, batch["points"],
                             batch["num_points"])

    np.testing.assert_array_equal(np.asarray(det_plain.valid),
                                  np.asarray(det_sh.valid))
    np.testing.assert_allclose(np.asarray(det_plain.scores),
                               np.asarray(det_sh.scores),
                               rtol=0.02, atol=1e-3)


def test_fused_backend_resolution_sharded():
    """Round-3 rules: batch sharding no longer forbids 'fused'; spatial
    'model' sharding still does."""
    import pytest

    from voxelnet_tpu.config import get_config
    from voxelnet_tpu.models.voxelnet import resolve_vfe_backend

    ok = get_config("Car", data={"vfe_backend": "fused"},
                    system={"num_data_shards": 4})
    assert resolve_vfe_backend(ok) == "fused"
    bad = get_config("Car", data={"vfe_backend": "fused"},
                     system={"num_model_shards": 2})
    with pytest.raises(ValueError, match="model"):
        resolve_vfe_backend(bad)
