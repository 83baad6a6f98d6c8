import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.models.scatter import scatter_to_dense
from voxelnet_tpu.models.voxelnet import build_model, init_params, param_count


def test_scatter_to_dense_basic():
    feats = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [0.0, 0.0]]])  # (1, 3, 2)
    coords = jnp.asarray([[[0, 1, 2], [1, 0, 0], [0, 0, 0]]])
    counts = jnp.asarray([[2, 5, 0]])   # third voxel is padding
    dense = scatter_to_dense(feats, coords, counts, (2, 2, 3))
    assert dense.shape == (1, 2, 2, 3, 2)
    np.testing.assert_allclose(dense[0, 0, 1, 2], [1.0, 2.0])
    np.testing.assert_allclose(dense[0, 1, 0, 0], [3.0, 4.0])
    # padding voxel must NOT write to (0,0,0)
    np.testing.assert_allclose(dense[0, 0, 0, 0], [0.0, 0.0])
    assert float(jnp.abs(dense).sum()) == pytest.approx(10.0)


def test_forward_shapes_and_dtype(tiny_config):
    cfg = tiny_config
    variables = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)
    B, K, T = 2, cfg.data.max_voxels, cfg.object.points_per_voxel
    rng = np.random.default_rng(0)
    feats = rng.normal(0, 1, (B, K, T, 7)).astype(np.float32)
    # voxelizer contract (models/scatter.py): unique coords in ascending
    # (z*H + y)*W + x order per frame — scatter_hints relies on it
    D, Hh, Ww = cfg.object.depth, cfg.object.height, cfg.object.width
    lin = np.stack([np.sort(rng.choice(D * Hh * Ww, K, replace=False))
                    for _ in range(B)])
    coords = np.stack([lin // (Hh * Ww), (lin // Ww) % Hh, lin % Ww],
                      axis=-1).astype(np.int32)
    # occupied voxels carry >= 1 point; zero-count rows only trail
    # (voxelizer contract) — emulate with a trailing padding block
    counts = rng.integers(1, T, (B, K)).astype(np.int32)
    counts[:, K - 5:] = 0

    cls_logits, reg = jax.jit(
        lambda v, f, c, n: model.apply(v, f, c, n, train=False)
    )(variables, feats, coords, counts)
    hp, wp = cfg.object.feature_height, cfg.object.feature_width
    assert cls_logits.shape == (B, hp, wp, 2)
    assert reg.shape == (B, hp, wp, 14)
    assert cls_logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(cls_logits)).all()


def test_padding_voxels_do_not_affect_output(tiny_config):
    """Masking contract: garbage in padding slots (count == 0) is inert."""
    cfg = tiny_config
    variables = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)
    B, K, T = 1, cfg.data.max_voxels, cfg.object.points_per_voxel
    rng = np.random.default_rng(1)

    feats = np.zeros((B, K, T, 7), np.float32)
    coords = np.zeros((B, K, 3), np.int32)
    counts = np.zeros((B, K), np.int32)
    # 10 real voxels
    feats[:, :10] = rng.normal(0, 1, (B, 10, T, 7))
    coords[:, :10] = [[2, 5, 7]] * 10
    coords[0, :10, 2] = np.arange(10)
    counts[:, :10] = 5

    fwd = jax.jit(lambda v, f, c, n: model.apply(v, f, c, n, train=False))
    out1 = fwd(variables, feats, coords, counts)

    feats2 = feats.copy()
    feats2[:, 10:] = 999.0  # garbage in padding voxels
    coords2 = coords.copy()
    coords2[:, 10:] = 1     # even pointing at a real cell
    out2 = fwd(variables, feats2, coords2, counts)

    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]),
                               atol=1e-5)


def test_padding_points_do_not_affect_output(tiny_config):
    """Points beyond a voxel's count are masked inside the VFE."""
    cfg = tiny_config
    variables = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)
    B, K, T = 1, 32, cfg.object.points_per_voxel
    rng = np.random.default_rng(2)
    feats = rng.normal(0, 1, (B, K, T, 7)).astype(np.float32)
    coords = np.stack(np.meshgrid(*[np.arange(4)] * 2, indexing="ij"),
                      -1).reshape(-1, 2)
    coords = np.concatenate(
        [np.zeros((16, 1), int), coords], 1)[None].repeat(2, 0)[:1]
    coords = np.concatenate([coords, coords + 1], 1).astype(np.int32)
    counts = np.full((B, K), 3, np.int32)

    fwd = jax.jit(lambda v, f, c, n: model.apply(v, f, c, n, train=False))
    out1 = fwd(variables, feats, coords, counts)
    feats2 = feats.copy()
    feats2[:, :, 3:] = -123.0   # garbage beyond count=3
    out2 = fwd(variables, feats2, coords, counts)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]),
                               atol=1e-5)


def test_batchnorm_stats_update(tiny_config):
    cfg = tiny_config
    variables = init_params(cfg, jax.random.key(0))
    model = build_model(cfg)
    B, K, T = 2, 16, cfg.object.points_per_voxel
    rng = np.random.default_rng(3)
    feats = rng.normal(0, 1, (B, K, T, 7)).astype(np.float32)
    coords = np.zeros((B, K, 3), np.int32)
    coords[..., 2] = np.arange(K)
    counts = np.full((B, K), 4, np.int32)

    (out, updates) = jax.jit(
        lambda v, f, c, n: model.apply(v, f, c, n, train=True,
                                       mutable=["batch_stats"]))(
        variables, feats, coords, counts)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


def test_param_count_plausible(tiny_config):
    variables = init_params(tiny_config, jax.random.key(0))
    n = param_count(variables)
    # VFE (7->32->128) + 3x Conv3D + 17 Conv2D + 3 deconv + heads
    assert 5_000_000 < n < 15_000_000


def test_middle_backend_typo_rejected(tiny_config):
    """An unknown data.middle_backend must fail loudly, not silently run
    the conv3d path (it would invalidate lowering A/B measurements)."""
    from dataclasses import replace

    from voxelnet_tpu.models.voxelnet import resolve_middle_backend

    bad = replace(tiny_config,
                  data=replace(tiny_config.data, middle_backend="fold2d"))
    with pytest.raises(ValueError, match="middle_backend"):
        resolve_middle_backend(bad)


def test_auto_vfe_backend_degrades_without_mesh(tiny_config, monkeypatch):
    """A batch-sharded config built by a single-device caller (predict
    CLI, bench, A/B dumps) with vfe_backend='auto' must degrade to the
    XLA path, not raise; the explicit 'fused' request must still raise
    (silent semantic change vs a hard error)."""
    from dataclasses import replace

    from voxelnet_tpu.models import voxelnet as vx

    # make resolve_vfe_backend('auto') pick 'fused' as it would on TPU
    monkeypatch.setattr(vx.jax, "default_backend", lambda: "tpu")
    sharded = replace(tiny_config,
                      system=replace(tiny_config.system, num_data_shards=2))
    assert vx.resolve_vfe_backend(sharded) == "fused"
    vx.make_inference_fn(sharded, mesh=None)  # must not raise

    explicit = replace(
        sharded, data=replace(sharded.data, vfe_backend="fused"))
    with pytest.raises(ValueError, match="mesh"):
        vx.make_inference_fn(explicit, mesh=None)


def test_scatter_hints_equivalence():
    """Hinted scatter == plain scatter on voxelizer-ordered buffers
    (ascending unique linear ids, padding trailing)."""
    rng = np.random.default_rng(3)
    D, H, W, K, C = 4, 8, 8, 24, 16
    lin = np.sort(rng.choice(D * H * W, K, replace=False))
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W],
                      axis=-1).astype(np.int32)[None]
    feats = rng.normal(0, 1, (1, K, C)).astype(np.float32)
    counts = np.concatenate(
        [rng.integers(1, 5, K - 6), np.zeros(6, int)]).astype(np.int32)[None]
    a = scatter_to_dense(jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(counts), (D, H, W))
    b = scatter_to_dense(jnp.asarray(feats), jnp.asarray(coords),
                         jnp.asarray(counts), (D, H, W),
                         indices_sorted=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
