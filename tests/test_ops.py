"""Tests for anchors, box coding, IoU, targets, NMS, losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxelnet_tpu.config import get_config
from voxelnet_tpu.ops import anchors as anchor_ops
from voxelnet_tpu.ops import box_coding, iou, losses, nms, targets


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_anchor_grid_matches_reference_layout():
    obj = get_config("Car").object
    a = anchor_ops.generate_anchors(obj)
    assert a.shape == (200, 176, 2, 7)
    # inclusive linspace endpoints (voxelnet/utils.py:113-114)
    assert a[0, 0, 0, 0] == pytest.approx(0.0)        # x at first col
    assert a[0, -1, 0, 0] == pytest.approx(70.4)
    assert a[0, 0, 0, 1] == pytest.approx(-40.0)      # y at first row
    assert a[-1, 0, 0, 1] == pytest.approx(40.0)
    assert a[0, 0, 0, 6] == 0.0
    assert a[0, 0, 1, 6] == pytest.approx(np.pi / 2)
    np.testing.assert_allclose(a[..., 2], obj.anchor_z)
    np.testing.assert_allclose(a[..., 3], obj.anchor_h)


def test_anchor_diagonals():
    obj = get_config("Car").object
    flat = anchor_ops.anchors_flat(obj)
    d = anchor_ops.anchor_diagonals(flat)
    np.testing.assert_allclose(d, np.sqrt(1.6 ** 2 + 3.9 ** 2), rtol=1e-6)


# ---------------------------------------------------------------------------
# box coding
# ---------------------------------------------------------------------------

def test_encode_decode_roundtrip():
    obj = get_config("Car").object
    flat = jnp.asarray(anchor_ops.anchors_flat(obj)[:10])
    rng = np.random.default_rng(0)
    boxes = np.asarray(flat).copy()
    boxes[:, :3] += rng.normal(0, 0.5, (10, 3))
    boxes[:, 3:6] *= rng.uniform(0.8, 1.2, (10, 3))
    boxes[:, 6] += rng.uniform(-0.3, 0.3, 10)
    enc = box_coding.encode_boxes(jnp.asarray(boxes), flat, obj.anchor_h)
    dec = box_coding.decode_deltas(enc, flat, obj.anchor_h)
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-5)


def test_encode_decode_sin_yaw():
    """yaw_mode='sin': roundtrip recovers yaw modulo the pi ambiguity,
    and boxes at r vs r - pi (identical rectangles) encode to the SAME
    target — the property that fixes the near-±pi/2 regression averaging
    (train.yaw_encoding)."""
    obj = get_config("Car").object
    flat = jnp.asarray(anchor_ops.anchors_flat(obj)[:8])
    rng = np.random.default_rng(0)
    boxes = np.asarray(flat).copy()
    boxes[:, 6] += rng.uniform(-0.4, 0.4, 8)
    enc = box_coding.encode_boxes(jnp.asarray(boxes), flat, obj.anchor_h,
                                  yaw_mode="sin")
    dec = box_coding.decode_deltas(enc, flat, obj.anchor_h, yaw_mode="sin")
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-5)

    # a rectangle at r and r - pi is the SAME shape -> IDENTICAL target
    # (this requires the wrap-then-sin form; plain sin flips the sign
    # for residuals beyond +-pi/2 and decodes a mirrored rectangle)
    twisted = boxes.copy()
    twisted[:, 6] -= np.pi
    enc2 = box_coding.encode_boxes(jnp.asarray(twisted), flat, obj.anchor_h,
                                   yaw_mode="sin")
    np.testing.assert_allclose(np.asarray(enc2[:, 6]),
                               np.asarray(enc[:, 6]), atol=1e-6)
    near = np.asarray(flat).copy()
    near[:, 6] = 1.5  # near +pi/2
    mirror = near.copy()
    mirror[:, 6] = 1.5 - np.pi  # ~-1.64 == same rectangle
    e1 = box_coding.encode_boxes(jnp.asarray(near), flat, obj.anchor_h,
                                 yaw_mode="sin")
    e2 = box_coding.encode_boxes(jnp.asarray(mirror), flat, obj.anchor_h,
                                 yaw_mode="sin")
    np.testing.assert_allclose(np.asarray(e1[:, 6]), np.asarray(e2[:, 6]),
                               atol=1e-6)
    # decode of the shared target recovers an IoU-equivalent rectangle
    # for BOTH originals: yaw agrees with each modulo pi
    d = box_coding.decode_deltas(e2, flat, obj.anchor_h, yaw_mode="sin")
    dyaw = np.asarray(d[:, 6])
    for ref in (near[:, 6], mirror[:, 6]):
        wrapped = (dyaw - ref) - np.pi * np.round((dyaw - ref) / np.pi)
        np.testing.assert_allclose(wrapped, 0.0, atol=1e-5)


def test_assign_targets_sin_np_matches_jax(tiny_config=None):
    """np/jax target-assignment twins agree in yaw_mode='sin' too."""
    from voxelnet_tpu.ops import targets as T

    obj = get_config(
        "Car", object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4}).object
    flat = anchor_ops.anchors_flat(obj)
    standup = T.anchor_standup_np(obj)
    gt = np.zeros((4, 7), np.float32)
    gt[0] = [6.0, 0.0, -1.0, 1.56, 1.6, 3.9, 1.45]
    gt[1] = [9.0, 3.0, -1.0, 1.56, 1.6, 3.9, -1.5]
    mask = np.array([True, True, False, False])
    kw = dict(pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
              anchor_h=obj.anchor_h, yaw_mode="sin")
    a = T.assign_targets(jnp.asarray(gt), jnp.asarray(mask),
                         jnp.asarray(flat), jnp.asarray(standup), **kw)
    pos, neg, reg = T.assign_targets_np(gt, mask, flat, standup, **kw)
    np.testing.assert_allclose(np.asarray(a.pos_mask), pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.neg_mask), neg, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.reg_targets), reg, atol=1e-4)
    # every encoded yaw target is a sine — bounded
    assert np.abs(reg[:, 6]).max() <= 1.0 + 1e-6


def test_decode_map_layout():
    """(B, H', W', 14) map decode equals flat (B, A, 7) decode."""
    obj = get_config(
        "Car", object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4}).object
    flat = jnp.asarray(anchor_ops.anchors_flat(obj))
    hp, wp = obj.feature_height, obj.feature_width
    rng = np.random.default_rng(1)
    reg_map = rng.normal(0, 0.1, (1, hp, wp, 14)).astype(np.float32)
    dec = box_coding.decode_deltas(
        jnp.asarray(reg_map).reshape(1, -1, 7), flat, obj.anchor_h)
    assert dec.shape == (1, hp * wp * 2, 7)


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def test_standup_iou_basic():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[1.0, 1.0, 3.0, 3.0], [5.0, 5.0, 6.0, 6.0],
                     [0.0, 0.0, 2.0, 2.0]])
    out = np.asarray(iou.standup_iou(a, b))
    np.testing.assert_allclose(out[0], [1 / 7, 0.0, 1.0], atol=1e-6)


def test_rotated_iou_aligned_equals_standup():
    b1 = jnp.asarray([[0.0, 0.0, 2.0, 4.0, 0.0]])
    b2 = jnp.asarray([[1.0, 0.5, 2.0, 4.0, 0.0]])
    r = float(iou.rotated_iou(b1, b2)[0, 0])
    # manual: boxes [-2,2]x[-1,1] and [-1,3]x[-0.5,1.5] -> inter 3*1.5=4.5
    inter = 3.0 * 1.5
    expect = inter / (8 + 8 - inter)
    assert r == pytest.approx(expect, abs=1e-5)


def test_rotated_iou_45_degrees():
    # unit square vs itself rotated 45 deg: intersection is a regular
    # octagon with area 2*(sqrt(2)-1) ~ 0.8284
    b1 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = jnp.asarray([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter_expect = 2 * (np.sqrt(2) - 1)
    expect = inter_expect / (2 - inter_expect)
    assert float(iou.rotated_iou(b1, b2)[0, 0]) == pytest.approx(
        expect, abs=1e-4)


def test_rotated_iou_identity_and_disjoint():
    b = jnp.asarray([[3.0, 2.0, 1.5, 4.0, 0.7]])
    assert float(iou.rotated_iou(b, b)[0, 0]) == pytest.approx(1.0, abs=1e-5)
    far = jnp.asarray([[30.0, 20.0, 1.5, 4.0, -0.3]])
    assert float(iou.rotated_iou(b, far)[0, 0]) == 0.0


def test_rotated_iou_matches_host_reference():
    from voxelnet_tpu.data.augment import rotated_iou_2d

    rng = np.random.default_rng(2)
    boxes1 = np.stack([
        rng.uniform(-5, 5, 8), rng.uniform(-5, 5, 8),
        rng.uniform(1, 3, 8), rng.uniform(2, 5, 8),
        rng.uniform(-np.pi / 2, np.pi / 2, 8)], axis=1).astype(np.float32)
    boxes2 = boxes1 + rng.normal(0, 1.0, boxes1.shape).astype(np.float32)
    boxes2[:, 2:4] = np.abs(boxes2[:, 2:4]) + 0.5
    dev = np.asarray(iou.rotated_iou(jnp.asarray(boxes1),
                                     jnp.asarray(boxes2)))
    for i in range(8):
        for j in range(8):
            host = rotated_iou_2d(boxes1[i], boxes2[j])
            assert dev[i, j] == pytest.approx(host, abs=1e-4)


# ---------------------------------------------------------------------------
# targets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def small_obj():
    return get_config(
        "Car", object={"x_max": 12.8, "y_min": -6.4, "y_max": 6.4}).object


def test_assign_targets_basic(small_obj):
    obj = small_obj
    flat = jnp.asarray(anchor_ops.anchors_flat(obj))
    standup = jnp.asarray(targets.anchor_standup_np(obj))
    A = flat.shape[0]

    # one GT exactly on some yaw-0 anchor
    gt_box = np.array(flat[100])  # even index -> yaw 0 anchor
    gt = np.zeros((4, 7), np.float32)
    gt[0] = gt_box
    mask = np.zeros((4,), bool)
    mask[0] = True

    out = jax.jit(lambda g, m: targets.assign_targets(
        g, m, flat, standup, pos_iou=obj.rpn_pos_iou,
        neg_iou=obj.rpn_neg_iou, anchor_h=obj.anchor_h))(
            jnp.asarray(gt), jnp.asarray(mask))

    pos = np.asarray(out.pos_mask)
    neg = np.asarray(out.neg_mask)
    assert pos[100] == 1.0                       # exact match is positive
    assert pos.sum() >= 1
    assert ((pos == 1) & (neg == 1)).sum() == 0  # exclusive
    assert neg.sum() > A * 0.5                   # most anchors negative
    # the matched anchor's targets encode ~zero deltas
    np.testing.assert_allclose(np.asarray(out.reg_targets)[100], 0.0,
                               atol=1e-5)


def test_assign_targets_no_gt(small_obj):
    obj = small_obj
    flat = jnp.asarray(anchor_ops.anchors_flat(obj))
    standup = jnp.asarray(targets.anchor_standup_np(obj))
    gt = np.zeros((4, 7), np.float32)
    mask = np.zeros((4,), bool)
    out = targets.assign_targets(
        jnp.asarray(gt), jnp.asarray(mask), flat, standup,
        pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
        anchor_h=obj.anchor_h)
    assert np.asarray(out.pos_mask).sum() == 0
    assert np.asarray(out.neg_mask).sum() == flat.shape[0]


def test_force_match_low_iou_gt(small_obj):
    """A GT overlapping no anchor above threshold still gets its argmax
    anchor marked positive (voxelnet/utils.py:411-414 rule)."""
    obj = small_obj
    flat = jnp.asarray(anchor_ops.anchors_flat(obj))
    standup = jnp.asarray(targets.anchor_standup_np(obj))
    # tiny box between anchor centers: IoU far below 0.6 everywhere
    gt = np.zeros((2, 7), np.float32)
    gt[0] = [6.1, 0.1, -1.0, 0.5, 0.4, 0.4, 0.0]
    mask = np.array([True, False])
    out = targets.assign_targets(
        jnp.asarray(gt), jnp.asarray(mask), flat, standup,
        pos_iou=obj.rpn_pos_iou, neg_iou=obj.rpn_neg_iou,
        anchor_h=obj.anchor_h)
    assert np.asarray(out.pos_mask).sum() == 1


def test_targets_to_maps_layout(small_obj):
    obj = small_obj
    hp, wp = obj.feature_height, obj.feature_width
    A = hp * wp * 2
    assign = targets.TargetAssignment(
        pos_mask=jnp.zeros((A,)).at[3].set(1.0),
        neg_mask=jnp.zeros((A,)),
        reg_targets=jnp.zeros((A, 7)).at[3, 0].set(0.5))
    pos, neg, reg = targets.targets_to_maps(assign, (hp, wp))
    assert pos.shape == (hp, wp, 2)
    assert reg.shape == (hp, wp, 14)
    # anchor 3 = cell (0, 1), yaw-1 slot
    assert float(pos[0, 1, 1]) == 1.0
    assert float(reg[0, 1, 7]) == 0.5


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _mkboxes(rows):
    """rows of (x, y, z, h, w, l, r)"""
    return jnp.asarray(np.array(rows, np.float32))


def test_nms_suppresses_overlaps():
    boxes = _mkboxes([
        [10, 0, -1, 1.5, 1.6, 3.9, 0.0],
        [10.2, 0.1, -1, 1.5, 1.6, 3.9, 0.0],   # overlaps the first
        [30, 5, -1, 1.5, 1.6, 3.9, 0.0],       # separate
    ])
    scores = jnp.asarray([0.99, 0.98, 0.97])
    out = jax.jit(lambda b, s: nms.nms_bev(
        b, s, score_thresh=0.5, iou_thresh=0.1, pre_topk=8, post_topk=4,
        mode="rotated"))(boxes, scores)
    valid = np.asarray(out.valid)
    assert valid.sum() == 2
    kept = np.asarray(out.boxes)[valid]
    np.testing.assert_allclose(sorted(kept[:, 0]), [10, 30], atol=1e-5)


def test_nms_approx_topk_is_exact():
    """The TPU NMS path selects candidates with lax.approx_max_k at
    recall_target=1.0 (ops/nms._top_k) — that must return the EXACT
    top-k (values and indices) of the gated score vector, here checked
    against lax.top_k on a large random vector with duplicates."""
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(20000,)).astype(np.float32)
    scores[rng.integers(0, 20000, 5000)] = -1.0  # gated-out duplicates
    g = jnp.asarray(scores)
    v_sort, i_sort = jax.lax.top_k(g, 256)
    v_apx, i_apx = jax.lax.approx_max_k(g, 256, recall_target=1.0)
    np.testing.assert_array_equal(np.asarray(v_sort), np.asarray(v_apx))
    # indices may reorder only among exactly-equal values
    mism = np.asarray(i_sort) != np.asarray(i_apx)
    assert np.all(np.asarray(v_sort)[mism] == np.asarray(v_apx)[mism])


def test_nms_score_threshold():
    boxes = _mkboxes([[10, 0, -1, 1.5, 1.6, 3.9, 0.0]])
    scores = jnp.asarray([0.3])
    out = nms.nms_bev(boxes, scores, score_thresh=0.96, iou_thresh=0.1,
                      pre_topk=4, post_topk=4, mode="rotated")
    assert np.asarray(out.valid).sum() == 0


def test_nms_standup_vs_rotated_disagree_on_diagonal():
    """Two thin diagonal boxes side by side: AABBs overlap heavily but the
    rotated rectangles barely touch — rotated NMS keeps both."""
    boxes = _mkboxes([
        [10, 0, -1, 1.5, 0.4, 6.0, np.pi / 4],
        [11.5, -1.5, -1, 1.5, 0.4, 6.0, np.pi / 4],
    ])
    scores = jnp.asarray([0.99, 0.98])
    rot = nms.nms_bev(boxes, scores, score_thresh=0.5, iou_thresh=0.1,
                      pre_topk=4, post_topk=4, mode="rotated")
    stand = nms.nms_bev(boxes, scores, score_thresh=0.5, iou_thresh=0.1,
                        pre_topk=4, post_topk=4, mode="standup")
    assert np.asarray(rot.valid).sum() == 2
    assert np.asarray(stand.valid).sum() == 1


def test_nms_ordering_and_padding():
    boxes = _mkboxes([[x, 0, -1, 1.5, 1.6, 3.9, 0.0]
                      for x in (10, 20, 30, 40, 50)])
    scores = jnp.asarray([0.97, 0.99, 0.961, 0.98, 0.3])
    out = nms.nms_bev(boxes, scores, score_thresh=0.96, iou_thresh=0.1,
                      pre_topk=8, post_topk=3, mode="rotated")
    v = np.asarray(out.valid)
    s = np.asarray(out.scores)
    assert v.tolist() == [True, True, True]
    np.testing.assert_allclose(s, [0.99, 0.98, 0.97], atol=1e-6)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def test_smooth_l1_correct_form():
    d = jnp.asarray([0.0, 0.05, 1.0, -2.0])
    t = jnp.zeros(4)
    out = np.asarray(losses.smooth_l1(d, t, sigma=3.0))
    sigma2 = 9.0
    np.testing.assert_allclose(out[0], 0.0, atol=1e-8)
    np.testing.assert_allclose(out[1], 0.5 * sigma2 * 0.05 ** 2, atol=1e-6)
    np.testing.assert_allclose(out[2], 1.0 - 0.5 / sigma2, atol=1e-6)
    np.testing.assert_allclose(out[3], 2.0 - 0.5 / sigma2, atol=1e-6)


def test_smooth_l1_buggy_reproduces_reference_formula():
    d = jnp.asarray([0.05, 1.0])
    t = jnp.zeros(2)
    out = np.asarray(losses.smooth_l1(d, t, sigma=3.0, buggy=True))
    sigma2 = 9.0
    for i, diff in enumerate([0.05, 1.0]):
        opt1 = 0.5 * sigma2 * diff * diff
        opt2 = abs(diff) - 0.5 / sigma2
        sign = 1.0 if abs(diff) < 1 / sigma2 else 0.0
        expect = opt1 * opt2 + opt2 * (1 - sign)
        assert out[i] == pytest.approx(expect, abs=1e-6)


def test_rpn_loss_matches_manual_numpy():
    rng = np.random.default_rng(0)
    B, H, W = 2, 4, 6
    logits = rng.normal(0, 1, (B, H, W, 2)).astype(np.float32)
    reg = rng.normal(0, 1, (B, H, W, 14)).astype(np.float32)
    pos = (rng.uniform(size=(B, H, W, 2)) < 0.1).astype(np.float32)
    neg = ((rng.uniform(size=(B, H, W, 2)) < 0.7) * (1 - pos)).astype(
        np.float32)
    tgt = rng.normal(0, 1, (B, H, W, 14)).astype(np.float32)

    out = losses.rpn_loss(
        jnp.asarray(logits), jnp.asarray(reg), jnp.asarray(pos),
        jnp.asarray(neg), jnp.asarray(tgt), alpha=1.5, beta=1.0, sigma=3.0)

    # manual numpy (probability formulation)
    p = 1 / (1 + np.exp(-logits))
    pos_sum = np.clip(pos.sum(axis=(1, 2, 3)), 1, None)[:, None, None, None]
    neg_sum = np.clip(neg.sum(axis=(1, 2, 3)), 1, None)[:, None, None, None]
    cls_pos = (-pos * np.log(p)) / pos_sum
    cls_neg = (-neg * np.log(1 - p)) / neg_sum
    cls_loss = (1.5 * cls_pos + 1.0 * cls_neg).sum()

    pos14 = np.repeat(pos, 7, axis=-1)
    diffs = reg * pos14 - tgt * pos14
    sigma2 = 9.0
    sl1 = np.where(np.abs(diffs) < 1 / sigma2,
                   0.5 * sigma2 * diffs ** 2, np.abs(diffs) - 0.5 / sigma2)
    reg_loss = (sl1 / pos_sum).sum()

    assert float(out.cls_loss) == pytest.approx(cls_loss, rel=1e-4)
    assert float(out.reg_loss) == pytest.approx(reg_loss, rel=1e-4)
    assert float(out.loss) == pytest.approx(cls_loss + reg_loss, rel=1e-4)


def test_assign_targets_np_matches_jax(tiny_config):
    """Host (pipeline-thread) target assignment must agree with the
    on-device path anchor-for-anchor."""
    import jax.numpy as jnp

    from voxelnet_tpu.ops import targets as t
    from voxelnet_tpu.ops.anchors import anchors_flat

    obj = tiny_config.object
    anchors = np.asarray(anchors_flat(obj), np.float32)
    standup = np.asarray(t.anchor_standup_np(obj), np.float32)
    rng = np.random.default_rng(3)
    G = 8
    gt = np.zeros((G, 7), np.float32)
    gt[:, 0] = rng.uniform(1, 12, G)
    gt[:, 1] = rng.uniform(-6, 6, G)
    gt[:, 2] = -1.0
    gt[:, 3:6] = [1.56, 1.6, 3.9]
    gt[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, G)
    mask = rng.uniform(size=G) < 0.7

    pos_np, neg_np, reg_np = t.assign_targets_np(
        gt, mask, anchors, standup, pos_iou=obj.rpn_pos_iou,
        neg_iou=obj.rpn_neg_iou, anchor_h=obj.anchor_h)
    a = t.assign_targets(
        jnp.asarray(gt), jnp.asarray(mask), jnp.asarray(anchors),
        jnp.asarray(standup), pos_iou=obj.rpn_pos_iou,
        neg_iou=obj.rpn_neg_iou, anchor_h=obj.anchor_h)
    np.testing.assert_array_equal(pos_np, np.asarray(a.pos_mask))
    np.testing.assert_array_equal(neg_np, np.asarray(a.neg_mask))
    np.testing.assert_allclose(reg_np, np.asarray(a.reg_targets),
                               atol=1e-5)
