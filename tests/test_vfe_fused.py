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
