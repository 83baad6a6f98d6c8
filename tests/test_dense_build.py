"""Pallas streaming dense-build (kernels/dense_build.py) equivalence.

Interpret-mode on CPU; the TPU (Mosaic) path is shape-identical and its
full-graph numbers live in BASELINE.md (scripts/probe_dense_gather.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.scatter import (scatter_to_dense,
                                         scatter_to_dense_streamed)


def _case(rng, D, H, W, K, C, B, nv):
    feats = jnp.asarray(rng.normal(0, 1, (B, K, C)).astype(np.float32),
                        jnp.bfloat16)
    coords = np.zeros((B, K, 3), np.int32)
    counts = np.zeros((B, K), np.int32)
    for b in range(B):
        ids = np.sort(rng.choice(D * H * W, nv, replace=False))
        coords[b, :nv, 0] = ids // (H * W)
        coords[b, :nv, 1] = (ids // W) % H
        coords[b, :nv, 2] = ids % W
        counts[b, :nv] = 1
    return feats, jnp.asarray(coords), jnp.asarray(counts)


def test_streamed_matches_scatter():
    rng = np.random.default_rng(0)
    D, H, W, K, C, B = 4, 16, 16, 64, 128, 2
    feats, coords, counts = _case(rng, D, H, W, K, C, B, nv=40)
    want = scatter_to_dense(feats, coords, counts, (D, H, W))
    got = jax.jit(lambda f: scatter_to_dense_streamed(
        f, coords, counts, (D, H, W), interpret=True))(feats)
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))


def test_streamed_dense_block():
    """A fully-occupied id range (worst-case block) and an empty frame."""
    rng = np.random.default_rng(1)
    D, H, W, K, C, B = 1, 8, 16, 128, 128, 1
    feats = jnp.asarray(rng.normal(0, 1, (B, K, C)).astype(np.float32),
                        jnp.bfloat16)
    ids = np.arange(128)  # every cell of the first 128 occupied
    coords = np.zeros((B, K, 3), np.int32)
    coords[0, :, 1] = ids // W
    coords[0, :, 2] = ids % W
    counts = np.ones((B, K), np.int32)
    want = scatter_to_dense(feats, jnp.asarray(coords),
                            jnp.asarray(counts), (D, H, W))
    got = scatter_to_dense_streamed(feats, jnp.asarray(coords),
                                    jnp.asarray(counts), (D, H, W),
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(want, np.float32),
                                  np.asarray(got, np.float32))
    # empty frame: all padding -> all zeros
    zero = scatter_to_dense_streamed(
        feats, jnp.asarray(coords), jnp.zeros((B, K), jnp.int32),
        (D, H, W), interpret=True)
    assert (np.asarray(zero, np.float32) == 0).all()


def test_streamed_vjp_matches_scatter():
    rng = np.random.default_rng(2)
    D, H, W, K, C, B = 4, 16, 16, 64, 128, 2
    feats, coords, counts = _case(rng, D, H, W, K, C, B, nv=40)
    cot = jnp.asarray(
        rng.normal(0, 1, (B, D, H, W, C)).astype(np.float32))

    def loss(fn):
        return lambda f: (fn(f).astype(jnp.float32) * cot).sum()

    ga = jax.grad(loss(lambda f: scatter_to_dense(
        f.astype(jnp.bfloat16), coords, counts, (D, H, W))))(
        feats.astype(jnp.float32))
    gb = jax.grad(loss(lambda f: scatter_to_dense_streamed(
        f.astype(jnp.bfloat16), coords, counts, (D, H, W),
        interpret=True)))(feats.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-2)


def test_resolve_dense_build(tiny_config):
    from voxelnet_tpu.models import voxelnet as vx

    cfg = tiny_config
    # 'auto' -> scatter everywhere (the pallas build measured equal on
    # the chip and carries extra constraints); explicit 'pallas' works
    assert vx.resolve_dense_build(cfg, "tpu") == "scatter"
    assert vx.resolve_dense_build(cfg, "cpu") == "scatter"
    assert vx.resolve_dense_build(cfg.replace(data=dataclasses.replace(
        cfg.data, dense_build="pallas")), "tpu") == "pallas"
    assert vx.resolve_dense_build(cfg.replace(data=dataclasses.replace(
        cfg.data, dense_build="scatter")), "tpu") == "scatter"
    # sharded configs keep the scatter (pallas_call doesn't partition)
    sharded = cfg.replace(system=cfg.system.__class__(
        **{**cfg.system.__dict__, "num_data_shards": 2}))
    assert vx.resolve_dense_build(sharded, "tpu") == "scatter"
    with pytest.raises(ValueError):
        vx.resolve_dense_build(sharded.replace(data=dataclasses.replace(
            sharded.data, dense_build="pallas")), "tpu")
    with pytest.raises(ValueError):
        vx.resolve_dense_build(cfg.replace(data=dataclasses.replace(
            cfg.data, dense_build="nope")), "tpu")


def test_model_pallas_dense_matches_scatter(tiny_config, tiny_batch):
    """Full model forward with dense_build='pallas' (interpret) must
    match the scatter graph."""
    from voxelnet_tpu.models.voxelnet import build_model, init_params
    from voxelnet_tpu.ops.voxelize import VoxelGridSpec, voxelize_batch_jax

    cfg = tiny_config
    spec = VoxelGridSpec.from_object_config(cfg.object)
    variables = init_params(cfg, jax.random.key(0))
    vox = voxelize_batch_jax(
        jnp.asarray(tiny_batch["points"]),
        jnp.asarray(tiny_batch["num_points"]), spec, cfg.data.max_voxels)

    base = build_model(cfg)  # cpu -> scatter
    cfg_p = cfg.replace(data=dataclasses.replace(
        cfg.data, dense_build="pallas"))
    pall = build_model(cfg_p)  # explicit pallas; cpu -> interpret
    out_a = jax.jit(lambda v, f, c, n: base.apply(v, f, c, n,
                                                  train=False))(
        variables, vox.features, vox.coords, vox.counts)
    out_b = jax.jit(lambda v, f, c, n: pall.apply(v, f, c, n,
                                                  train=False))(
        variables, vox.features, vox.coords, vox.counts)
    np.testing.assert_allclose(np.asarray(out_a[0]), np.asarray(out_b[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_a[1]), np.asarray(out_b[1]),
                               atol=1e-5)
