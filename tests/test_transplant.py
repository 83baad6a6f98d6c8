"""Guard for scripts/ab_transplant.py's torch->JAX weight mapping.

tests/test_parity_torch.py proves the JAX->torch direction; this proves
the shipped inverse used for the same-weights AP A/B (BASELINE.md): a
RANDOM torch model transplanted into the JAX graph must produce the same
logits on the same voxel buffers under reference VFE semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voxelnet_tpu.config import get_config  # noqa: E402
from voxelnet_tpu.models.voxelnet import build_model, init_params  # noqa: E402


def test_torch_to_jax_transplant_forward_matches():
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.ab_transplant import transplant
    from scripts.bench_baseline_torch import TorchModel

    cfg = get_config(
        "Car",
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        train={"compute_dtype": "float32"},
        compat={"bn_over_padding": True},
    )
    torch.manual_seed(11)
    tm = TorchModel(cfg.object.grid_size).eval()
    # non-trivial running stats so eval-mode BN is exercised
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d,
                          torch.nn.BatchNorm3d)):
            m.running_mean.data.normal_(0, 0.2)
            m.running_var.data.uniform_(0.5, 1.5)
    variables = transplant(init_params(cfg, jax.random.key(5)), tm)

    rng = np.random.default_rng(2)
    K, T = 48, cfg.object.points_per_voxel
    feats = rng.normal(0, 1, (1, K, T, 7)).astype(np.float32)
    feats[:, :, :, 3] = np.abs(feats[:, :, :, 3]) + 0.1
    feats[:, :, 12:, :] = 0.0
    counts = np.full((1, K), 12, np.int32)
    coords = np.zeros((1, K, 3), np.int32)
    coords[0, :, 0] = rng.integers(0, cfg.object.depth, K)
    coords[0, :, 1] = rng.integers(0, cfg.object.height, K)
    coords[0, :, 2] = rng.integers(0, cfg.object.width, K)
    lin = (coords[0, :, 0] * cfg.object.height + coords[0, :, 1]) \
        * cfg.object.width + coords[0, :, 2]
    _, uniq = np.unique(lin, return_index=True)
    keep = np.zeros(K, bool)
    keep[uniq] = True
    feats[0, ~keep] = 0.0
    counts[0, ~keep] = 0
    coords[0, ~keep] = 0

    model = build_model(cfg)
    cls_logits, reg = model.apply(
        variables, jnp.asarray(feats), jnp.asarray(coords),
        jnp.asarray(counts), train=False)

    with torch.no_grad():
        tc = torch.from_numpy(np.concatenate(
            [np.zeros((K, 1), np.int64), coords[0].astype(np.int64)], 1))
        tl, tr = tm(torch.from_numpy(feats[0]), tc, 1, logits=True)

    jl, jr = np.asarray(cls_logits), np.asarray(reg)
    tl = tl.numpy().transpose(0, 2, 3, 1)
    tr = tr.numpy().transpose(0, 2, 3, 1)
    assert jl.std() > 1e-3
    np.testing.assert_allclose(jl, tl, atol=2e-3)
    np.testing.assert_allclose(jr, tr, atol=2e-3)
