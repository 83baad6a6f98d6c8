"""Stage-wise numerics parity vs a PyTorch implementation of the reference.

BASELINE.json asks for numerics "validated against the PyTorch reference per
stage". The torch model in scripts/bench_baseline_torch.py reproduces the
reference topology (voxelnet/model.py:60-281); here we copy weights between
frameworks and assert the forward activations agree in float32:

  * VFE layer (Dense+ReLU+BN+max+concat) — with BN running stats
  * sparse-to-dense scatter + Conv3D middle stack
  * Conv2D block + ConvTranspose2d deconv
  * full network probability/regression maps

All in eval mode (BatchNorm running averages) and with
`bn_over_padding=True` so the masked-BN upgrade is disabled for bit parity.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_baseline_torch import TorchModel  # noqa: E402
from voxelnet_tpu.config import get_config  # noqa: E402
from voxelnet_tpu.models.voxelnet import build_model, init_params  # noqa: E402


@pytest.fixture(scope="module")
def parity_setup():
    cfg = get_config(
        "Car",
        object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4},
        train={"compute_dtype": "float32"},
        compat={"bn_over_padding": True},
    )
    variables = init_params(cfg, jax.random.key(42))
    jax_model = build_model(cfg)
    torch_model = TorchModel(cfg.object.grid_size).eval()
    _copy_weights(variables, torch_model)
    return cfg, jax_model, variables, torch_model


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _copy_dense(tm, params, stats=None):
    tm.weight.data = _t(params["kernel"]).T.contiguous()
    tm.bias.data = _t(params["bias"])


def _copy_bn(tbn, params, stats, rng):
    tbn.weight.data = _t(params["scale"])
    tbn.bias.data = _t(params["bias"])
    # randomize running stats so eval-mode BN actually exercises them
    mean = rng.normal(0, 0.1, tbn.running_mean.shape).astype(np.float32)
    var = rng.uniform(0.5, 1.5, tbn.running_var.shape).astype(np.float32)
    tbn.running_mean.data = _t(mean)
    tbn.running_var.data = _t(var)
    stats["mean"] = jnp.asarray(mean)
    stats["var"] = jnp.asarray(var)


def _copy_conv2d(tm, params):
    tm.weight.data = _t(params["kernel"]).permute(3, 2, 0, 1).contiguous()
    tm.bias.data = _t(params["bias"])


def _copy_conv3d(tm, params):
    tm.weight.data = _t(params["kernel"]).permute(4, 3, 0, 1, 2).contiguous()
    tm.bias.data = _t(params["bias"])


def _copy_deconv2d(tm, params):
    # flax ConvTranspose kernel (kh, kw, cin, cout) corresponds to torch
    # ConvTranspose2d weight (cin, cout, kh, kw) with SPATIALLY FLIPPED taps
    k = np.asarray(params["kernel"], np.float32)[::-1, ::-1].copy()
    tm.weight.data = _t(k).permute(2, 3, 0, 1).contiguous()
    tm.bias.data = _t(params["bias"])


def _copy_weights(variables, tm: "TorchModel"):
    rng = np.random.default_rng(7)
    p = variables["params"]
    s = variables["batch_stats"]
    fn = p["feature_net"]
    sn = s["feature_net"]

    for name, tvfe in (("vfe1", tm.vfe1), ("vfe2", tm.vfe2)):
        _copy_dense(tvfe.fcn[0], fn[name]["fcn"])
        _copy_bn(tvfe.bn, fn[name]["bn"], sn[name]["bn"], rng)

    mid = p["middle"]
    smid = s["middle"]
    for i in range(3):
        blk = mid[f"ConvBlock3D_{i}"]
        sblk = smid[f"ConvBlock3D_{i}"]
        _copy_conv3d(tm.middle[i * 3], blk["Conv_0"])
        _copy_bn(tm.middle[i * 3 + 1], blk["BatchNorm_0"],
                 sblk["BatchNorm_0"], rng)

    rpn = p["rpn"]
    srpn = s["rpn"]

    def copy_block(tblock, offset, count):
        for j in range(count):
            blk = rpn[f"ConvBNReLU_{offset + j}"]
            sblk = srpn[f"ConvBNReLU_{offset + j}"]
            _copy_conv2d(tblock[j][0], blk["Conv_0"])
            _copy_bn(tblock[j][1], blk["BatchNorm_0"], sblk["BatchNorm_0"],
                     rng)

    copy_block(tm.block1, 0, 5)
    copy_block(tm.block2, 5, 6)
    copy_block(tm.block3, 11, 6)

    for i, tdec in enumerate((tm.deconv1, tm.deconv2, tm.deconv3)):
        blk = rpn[f"DeconvBNReLU_{i}"]
        sblk = srpn[f"DeconvBNReLU_{i}"]
        _copy_deconv2d(tdec[0], blk["ConvTranspose_0"])
        _copy_bn(tdec[1], blk["BatchNorm_0"], sblk["BatchNorm_0"], rng)

    _copy_conv2d(tm.prob_head, rpn["prob_conv"])
    _copy_conv2d(tm.reg_head, rpn["reg_conv"])


def test_full_forward_parity(parity_setup):
    cfg, jax_model, variables, torch_model = parity_setup
    rng = np.random.default_rng(0)
    K, T = 64, cfg.object.points_per_voxel
    feats = rng.normal(0, 1, (1, K, T, 7)).astype(np.float32)
    # reference masking keys off max-over-channels != 0; keep real points'
    # reflectance positive and zero the padded rows so both maskings agree
    feats[:, :, :, 3] = np.abs(feats[:, :, :, 3]) + 0.1
    feats[:, :, 20:, :] = 0.0
    counts = np.full((1, K), 20, np.int32)
    coords = np.zeros((1, K, 3), np.int32)
    coords[0, :, 0] = rng.integers(0, cfg.object.depth, K)
    coords[0, :, 1] = rng.integers(0, cfg.object.height, K)
    coords[0, :, 2] = rng.integers(0, cfg.object.width, K)
    # unique coords (torch sparse sums duplicates; jax .set overwrites)
    lin = (coords[0, :, 0] * cfg.object.height + coords[0, :, 1]) \
        * cfg.object.width + coords[0, :, 2]
    _, uniq_idx = np.unique(lin, return_index=True)
    keep = np.zeros(K, bool)
    keep[uniq_idx] = True
    feats[0, ~keep] = 0.0
    counts[0, ~keep] = 0
    coords[0, ~keep] = 0

    cls_logits, reg = jax.jit(
        lambda v, f, c, n: jax_model.apply(v, f, c, n, train=False)
    )(variables, feats, coords, counts)
    jl = np.asarray(cls_logits)
    jr = np.asarray(reg)

    with torch.no_grad():
        tcoords = torch.from_numpy(np.concatenate(
            [np.zeros((K, 1), np.int64),
             coords[0].astype(np.int64)], axis=1))
        tlogits, treg = torch_model(_t(feats[0]), tcoords, 1, logits=True)
    tl = tlogits.numpy().transpose(0, 2, 3, 1)
    tr = treg.numpy().transpose(0, 2, 3, 1)

    # Compare LOGITS with a tolerance far below their own spread: a
    # random-init net's sigmoid map is nearly constant (std ~4e-3), so a
    # loose sigmoid atol once masked a middle->BEV channel-fold order
    # mismatch (c-major vs d-major) that scrambled every downstream
    # channel yet moved probabilities by < 2e-2. float32 summation-order
    # drift through ~20 conv+BN layers measures ~1e-4 here.
    assert jl.std() > 1e-3          # guard: outputs must actually vary
    np.testing.assert_allclose(jl, tl, atol=2e-3)
    np.testing.assert_allclose(jr, tr, atol=2e-3)
    # and the maps must correlate near-perfectly once centered
    for a, b in ((jl, tl), (jr, tr)):
        ac, bc = a.ravel() - a.mean(), b.ravel() - b.mean()
        assert float(np.corrcoef(ac, bc)[0, 1]) > 0.9999


def test_vfe_stage_parity(parity_setup):
    """Config-1 check: voxelize one frame and compare the VFE stack only."""
    cfg, jax_model, variables, torch_model = parity_setup
    rng = np.random.default_rng(1)
    K, T = 32, cfg.object.points_per_voxel
    feats = rng.normal(0, 1, (1, K, T, 7)).astype(np.float32)
    feats[:, :, :, 3] = np.abs(feats[:, :, :, 3]) + 0.1
    feats[:, :, 10:, :] = 0.0
    counts = np.full((1, K), 10, np.int32)

    from voxelnet_tpu.models.vfe import FeatureLearningNet

    fln = FeatureLearningNet(dtype=jnp.float32, bn_over_padding=True)
    fln_vars = {
        "params": variables["params"]["feature_net"],
        "batch_stats": variables["batch_stats"]["feature_net"],
    }
    jax_voxelwise = np.asarray(
        fln.apply(fln_vars, jnp.asarray(feats), jnp.asarray(counts),
                  train=False))

    with torch.no_grad():
        x = _t(feats[0])
        mask = (x.max(dim=2, keepdim=True).values != 0)
        h = torch_model.vfe1(x, mask)
        h = torch_model.vfe2(h, mask)
        torch_voxelwise = h.max(dim=1).values.numpy()

    np.testing.assert_allclose(jax_voxelwise[0], torch_voxelwise, atol=2e-4)


def test_middle_bev_flatten_order_matches_torch(parity_setup):
    """The (D', C) -> BEV-channel fold must be CHANNEL-major, matching the
    reference's NCDHW view (voxelnet/model.py:262: bev_ch = c*D' + d).
    A d-major fold produces numerically identical per-plane values in a
    permuted channel order — downstream convs then read scrambled inputs
    under weight transplant, which the loose sigmoid-level full-forward
    tolerance once failed to catch."""
    cfg, _, variables, torch_model = parity_setup
    from voxelnet_tpu.models.middle import MiddleLayers

    D, H, W = cfg.object.grid_size
    rng = np.random.default_rng(3)
    dense = rng.normal(0, 1, (1, D, H, W, 128)).astype(np.float32)

    mid = MiddleLayers(dtype=jnp.float32)
    mvars = {"params": variables["params"]["middle"],
             "batch_stats": variables["batch_stats"]["middle"]}
    jbev = np.asarray(mid.apply(mvars, jnp.asarray(dense), train=False))[0]

    with torch.no_grad():
        x = torch_model.middle(_t(dense).permute(0, 4, 1, 2, 3))
        tbev = x.reshape(1, -1, H, W).numpy()[0].transpose(1, 2, 0)

    assert jbev.shape == tbev.shape
    np.testing.assert_allclose(jbev, tbev, atol=2e-4)
