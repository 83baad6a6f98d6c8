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


def _make_voxel_batch(cfg, seed=0, K=64):
    """Shared voxel-buffer batch both stacks accept.

    Every voxel carries the full T points and coords are all distinct:
    masked/empty rows would create exact value TIES in the voxel
    max-pools, where the frameworks pick different (equally valid)
    subgradients — jax splits among ties, torch routes to the first —
    and one-step gradient parity would measure that tie-breaking choice
    instead of the training semantics."""
    rng = np.random.default_rng(seed)
    T = cfg.object.points_per_voxel
    feats = rng.normal(0, 1, (1, K, T, 7)).astype(np.float32)
    feats[:, :, :, 3] = np.abs(feats[:, :, :, 3]) + 0.1
    counts = np.full((1, K), T, np.int32)
    D, H, W = cfg.object.depth, cfg.object.height, cfg.object.width
    lin = rng.choice(D * H * W, size=K, replace=False)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W],
                      axis=-1).astype(np.int32)[None]
    return feats, coords, counts


def _assert_weights_match(params, tm, atol, also_changed_from=None):
    """Walk the _copy_weights mapping in reverse: every torch tensor,
    mapped back to the flax layout, must match the jax param. With
    `also_changed_from` (the pre-step params), additionally require that
    the step actually moved a meaningful fraction of tensors."""
    pairs = []

    def add(name, tt, jp, perm=None, flip=False, transpose=False):
        w = tt.detach().numpy()
        if transpose:
            w = w.T
        if perm is not None:
            w = w.transpose(perm)
        if flip:
            w = w[::-1, ::-1]
        jp = np.asarray(jp)
        pairs.append((name, jp, w.astype(jp.dtype).copy()))

    fn = params["feature_net"]
    for name, tvfe in (("vfe1", tm.vfe1), ("vfe2", tm.vfe2)):
        add(f"{name}.fcn.kernel", tvfe.fcn[0].weight, fn[name]["fcn"]["kernel"],
            transpose=True)
        add(f"{name}.fcn.bias", tvfe.fcn[0].bias, fn[name]["fcn"]["bias"])
        add(f"{name}.bn.scale", tvfe.bn.weight, fn[name]["bn"]["scale"])
        add(f"{name}.bn.bias", tvfe.bn.bias, fn[name]["bn"]["bias"])

    mid = params["middle"]
    for i in range(3):
        blk = mid[f"ConvBlock3D_{i}"]
        add(f"mid{i}.kernel", tm.middle[i * 3].weight, blk["Conv_0"]["kernel"],
            perm=(2, 3, 4, 1, 0))
        add(f"mid{i}.bias", tm.middle[i * 3].bias, blk["Conv_0"]["bias"])
        add(f"mid{i}.bn.scale", tm.middle[i * 3 + 1].weight,
            blk["BatchNorm_0"]["scale"])
        add(f"mid{i}.bn.bias", tm.middle[i * 3 + 1].bias,
            blk["BatchNorm_0"]["bias"])

    rpn = params["rpn"]

    def add_block(tblock, offset, count):
        for j in range(count):
            blk = rpn[f"ConvBNReLU_{offset + j}"]
            add(f"rpn{offset + j}.kernel", tblock[j][0].weight,
                blk["Conv_0"]["kernel"], perm=(2, 3, 1, 0))
            add(f"rpn{offset + j}.bias", tblock[j][0].bias,
                blk["Conv_0"]["bias"])
            add(f"rpn{offset + j}.bn.scale", tblock[j][1].weight,
                blk["BatchNorm_0"]["scale"])
            add(f"rpn{offset + j}.bn.bias", tblock[j][1].bias,
                blk["BatchNorm_0"]["bias"])

    add_block(tm.block1, 0, 5)
    add_block(tm.block2, 5, 6)
    add_block(tm.block3, 11, 6)

    for i, tdec in enumerate((tm.deconv1, tm.deconv2, tm.deconv3)):
        blk = rpn[f"DeconvBNReLU_{i}"]
        add(f"deconv{i}.kernel", tdec[0].weight,
            blk["ConvTranspose_0"]["kernel"], perm=(2, 3, 0, 1), flip=True)
        add(f"deconv{i}.bias", tdec[0].bias, blk["ConvTranspose_0"]["bias"])
        add(f"deconv{i}.bn.scale", tdec[1].weight,
            blk["BatchNorm_0"]["scale"])
        add(f"deconv{i}.bn.bias", tdec[1].bias, blk["BatchNorm_0"]["bias"])

    add("prob.kernel", tm.prob_head.weight, rpn["prob_conv"]["kernel"],
        perm=(2, 3, 1, 0))
    add("prob.bias", tm.prob_head.bias, rpn["prob_conv"]["bias"])
    add("reg.kernel", tm.reg_head.weight, rpn["reg_conv"]["kernel"],
        perm=(2, 3, 1, 0))
    add("reg.bias", tm.reg_head.bias, rpn["reg_conv"]["bias"])

    for name, jp, tp in pairs:
        assert jp.shape == tp.shape, name
        np.testing.assert_allclose(jp, tp, atol=atol, err_msg=name)

    if also_changed_from is not None:
        import jax as _jax

        before = {p: np.asarray(v) for p, v in
                  _jax.tree_util.tree_leaves_with_path(also_changed_from)}
        after = _jax.tree_util.tree_leaves_with_path(params)
        # the 5/||g|| global-norm clip shrinks updates ~3 orders of
        # magnitude, so "moved" means any change at f64 resolution
        moved = sum(
            float(np.abs(np.asarray(v) - before[p]).max()) > 1e-12
            for p, v in after)
        assert moved > 0.9 * len(after), \
            f"only {moved}/{len(after)} tensors moved in the SGD step"


def test_one_step_training_parity(parity_setup):
    """VERDICT round-2 item 2: transplant identical init into both
    stacks, run ONE identical batch through one SGD(lr 0.01, global-norm
    clip 5) step on each — training semantics (batch-stat BatchNorm,
    corrected loss, grads, clipping, update) must agree weight-by-weight.
    This replaces the noisy equal-epoch endpoint tables as the
    training-parity proof (reference recipe: voxelnet/train.py:130-155).

    Runs in float64 so float32 noise cannot mask (or excuse) a semantic
    mismatch: in f32 the two stacks' gradients differ up to ~5% per
    tensor from ReLU-boundary flips on conv summation-order drift; in
    f64 the updated weights agree to ~5e-5 absolute, with the residual
    attributable to the flax BN layers being intentionally pinned to
    float32 accumulation (models/*: nn.BatchNorm(dtype=jnp.float32)).

    Running BN statistics are intentionally NOT compared: torch updates
    running_var with the unbiased batch variance, flax with the biased
    one — a documented framework deviation that does not touch weights."""
    import optax

    from ab_torch_train import rpn_loss_torch
    from voxelnet_tpu.ops import losses
    from voxelnet_tpu.ops.targets import TargetPrecomputer

    cfg, _, variables32, _ = parity_setup
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "compute_dtype": "float64"}))
    jax_model = build_model(cfg)
    tm = TorchModel(cfg.object.grid_size).train()
    _copy_weights(variables32, tm)
    tm = tm.double()

    feats, coords, counts = _make_voxel_batch(cfg, seed=5)
    feats = feats.astype(np.float64)
    gt = np.zeros((1, 8, 7), np.float32)
    gt[0, 0] = [6.0, 0.0, -1.0, 1.56, 1.6, 3.9, 0.3]
    gt[0, 1] = [9.5, 2.0, -1.0, 1.56, 1.6, 3.9, -0.6]
    gt_mask = np.zeros((1, 8), bool)
    gt_mask[0, :2] = True
    maps = TargetPrecomputer(cfg)({"gt_boxes": gt, "gt_mask": gt_mask})
    pos, neg, regt = (maps["target_pos"].astype(np.float64),
                      maps["target_neg"].astype(np.float64),
                      maps["target_reg"].astype(np.float64))

    lr, clip = 0.01, 5.0

    jax.config.update("jax_enable_x64", True)
    try:
        variables = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x), jnp.float64), variables32)

        # --- jax side: one jitted step --------------------------------
        tx = optax.chain(optax.clip_by_global_norm(clip), optax.sgd(lr))

        def loss_fn(params):
            (cl, rg), _upd = jax_model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                feats, coords, counts, train=True, mutable=["batch_stats"])
            out = losses.rpn_loss(
                cl, rg, jnp.asarray(pos), jnp.asarray(neg),
                jnp.asarray(regt), alpha=1.5, beta=1.0, sigma=3.0,
                from_logits=True)
            return out.loss, out

        (jloss, _), grads = jax.jit(
            lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
        )(variables["params"])
        jloss = float(jloss)
        jnorm = float(optax.global_norm(grads))
        updates, _ = tx.update(grads, tx.init(variables["params"]),
                               variables["params"])
        new_params = jax.tree.map(
            np.asarray, optax.apply_updates(variables["params"], updates))
    finally:
        jax.config.update("jax_enable_x64", False)

    # --- torch side: the reference recipe (train.py:151-155) ----------
    opt = torch.optim.SGD(tm.parameters(), lr=lr)
    tcoords = torch.from_numpy(np.concatenate(
        [np.zeros((feats.shape[1], 1), np.int64),
         coords[0].astype(np.int64)], axis=1))
    cl, rg = tm(torch.from_numpy(feats[0]), tcoords, 1, logits=True)
    tloss, _, _ = rpn_loss_torch(
        cl.permute(0, 2, 3, 1), rg.permute(0, 2, 3, 1),
        torch.from_numpy(pos), torch.from_numpy(neg),
        torch.from_numpy(regt), alpha=1.5, beta=1.0, sigma=3.0)
    opt.zero_grad()
    tloss.backward()
    tnorm = float(torch.nn.utils.clip_grad_norm_(tm.parameters(), clip))
    opt.step()

    # losses and grad norms agree before any update is taken
    assert jloss == pytest.approx(float(tloss), rel=5e-5)
    assert jnorm == pytest.approx(tnorm, rel=1e-3)
    # updated weights agree tensor-by-tensor, and the step really moved
    _assert_weights_match(new_params, tm, atol=2e-4,
                          also_changed_from=variables32["params"])
