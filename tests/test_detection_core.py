"""Tests for anchors, assignment, sampling, NMS post-processing, FPN, RPN."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment as scipy_lsa

from attentionshift_tpu.core.anchors import (
    anchor_valid_flags,
    base_anchors,
    grid_anchors,
    grid_anchors_per_level,
)
from attentionshift_tpu.core.assign import (
    hungarian_point_assign,
    max_iou_assign,
    random_sample,
)
from attentionshift_tpu.core.boxes import bbox2delta
from attentionshift_tpu.core.postprocess import multiclass_nms
from attentionshift_tpu.models.fpn import FPN
from attentionshift_tpu.models.rpn import RPNHead, rpn_loss, rpn_proposals

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- anchors
def test_base_anchors_mmdet_semantics():
    a = base_anchors(16, ratios=(0.5, 1.0, 2.0), scales=(8.0,))
    assert a.shape == (3, 4)
    # ratio = h/w; area approximately (16*8)^2
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-6)
    np.testing.assert_allclose(w * h, [128.0**2] * 3, rtol=1e-6)
    # centered at origin (center_offset = 0)
    np.testing.assert_allclose(a[:, 0] + a[:, 2], 0.0, atol=1e-4)


def test_grid_anchors_shift():
    anc = np.asarray(grid_anchors([(2, 3)], strides=[16]))
    assert anc.shape == (2 * 3 * 3, 4)
    base = base_anchors(16)
    np.testing.assert_allclose(anc[:3], base, rtol=1e-6)
    # anchor at (row 0, col 1) shifted by 16 in x
    np.testing.assert_allclose(anc[3:6, 0] - base[:, 0], 16.0, rtol=1e-6)
    # anchor at (row 1, col 0) shifted by 16 in y
    np.testing.assert_allclose(anc[9:12, 1] - base[:, 1], 16.0, rtol=1e-6)


def test_valid_flags_negative_border():
    anc = grid_anchors([(4, 4)], strides=[16])
    flags = anchor_valid_flags(anc, (64, 64), allowed_border=-1)
    assert bool(np.asarray(flags).all())


# ---------------------------------------------------------------- assigner
def _np_max_iou_assign(boxes, gts, pos_thr, neg_thr, min_pos_iou):
    def iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-10)

    ious = iou(gts, boxes)  # (G, N)
    n = boxes.shape[0]
    assigned = -np.ones(n, np.int64)
    mx = ious.max(0)
    am = ious.argmax(0)
    assigned[mx < neg_thr] = 0
    assigned[mx >= pos_thr] = am[mx >= pos_thr] + 1
    for i in range(len(gts)):  # match_low_quality, gt order
        gm = ious[i].max()
        if gm >= min_pos_iou:
            assigned[ious[i] == gm] = i + 1
    return assigned


def test_max_iou_assign_vs_oracle():
    rng = np.random.RandomState(0)
    n, g = 40, 5
    boxes = np.sort(rng.rand(n, 4) * 100, axis=-1)[:, [0, 1, 2, 3]]
    boxes = np.stack(
        [boxes[:, 0], boxes[:, 1], boxes[:, 0] + boxes[:, 2] % 30 + 5,
         boxes[:, 1] + boxes[:, 3] % 30 + 5], -1
    ).astype(np.float32)
    gts = boxes[rng.choice(n, g, replace=False)] + rng.randn(g, 4).astype(np.float32)
    res = max_iou_assign(
        jnp.asarray(boxes), jnp.asarray(gts),
        jnp.zeros((g,), jnp.int32), jnp.ones((g,), bool),
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
    )
    want = _np_max_iou_assign(boxes, gts, 0.7, 0.3, 0.3)
    np.testing.assert_array_equal(np.asarray(res.assigned_gt), want)


def test_max_iou_assign_padded_gt_ignored():
    boxes = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
    valid = jnp.asarray([True, False])
    res = max_iou_assign(
        boxes, gts, jnp.asarray([1, 2], jnp.int32), valid,
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
    )
    a = np.asarray(res.assigned_gt)
    assert a[0] == 1  # matched to gt 0
    assert a[1] == 0  # gt 1 is padding -> box 1 is background


# ---------------------------------------------------------------- sampler
def test_random_sample_caps():
    assigned = jnp.asarray([1] * 10 + [0] * 500 + [-1] * 20, jnp.int32)
    s = random_sample(KEY, assigned, num=256, pos_fraction=0.5)
    pos, neg = np.asarray(s.pos_mask), np.asarray(s.neg_mask)
    assert pos.sum() == 10  # fewer positives than the 128 cap
    assert neg.sum() == 256 - 10
    assert not (pos & (np.asarray(assigned) <= 0)).any()
    assert not (neg & (np.asarray(assigned) != 0)).any()


def test_random_sample_pos_cap():
    assigned = jnp.asarray([1] * 300 + [0] * 300, jnp.int32)
    s = random_sample(KEY, assigned, num=256, pos_fraction=0.5)
    assert int(s.pos_mask.sum()) == 128
    assert int(s.neg_mask.sum()) == 128


def test_random_sample_idx_matches_mask_form():
    """random_sample_idx (compact-index form, used by the RPN loss) and
    random_sample (mask form) make the IDENTICAL selection for the same
    key — same RNG draws, same top-k-by-uniform rule."""
    from attentionshift_tpu.core.assign import random_sample_idx

    rng = np.random.RandomState(7)
    for trial in range(4):
        n = [40, 600, 600, 3000][trial]
        assigned = jnp.asarray(
            rng.choice([-1, 0, 1, 2], size=n, p=[0.1, 0.7, 0.1, 0.1]),
            jnp.int32,
        )
        key = jax.random.PRNGKey(trial)
        m = random_sample(key, assigned, num=64, pos_fraction=0.25)
        s = random_sample_idx(key, assigned, num=64, pos_fraction=0.25)
        pos_idx = set(np.asarray(s.pos_idx)[np.asarray(s.pos_valid)].tolist())
        neg_idx = set(np.asarray(s.neg_idx)[np.asarray(s.neg_valid)].tolist())
        assert pos_idx == set(np.flatnonzero(np.asarray(m.pos_mask)).tolist())
        assert neg_idx == set(np.flatnonzero(np.asarray(m.neg_mask)).tolist())


# ---------------------------------------------------------------- hungarian
def test_hungarian_point_assign_vs_scipy():
    rng = np.random.RandomState(3)
    p, g, c = 20, 6, 5
    cls_pred = rng.randn(p, c).astype(np.float32)
    pt_pred = rng.rand(p, 2).astype(np.float32)
    gt_points = (rng.rand(g, 2) * 100).astype(np.float32)
    gt_labels = rng.randint(0, c, g)
    img_wh = np.asarray([100.0, 100.0], np.float32)

    got = np.asarray(
        hungarian_point_assign(
            jnp.asarray(cls_pred), jnp.asarray(pt_pred), jnp.asarray(gt_points),
            jnp.asarray(gt_labels), jnp.ones((g,), bool), jnp.asarray(img_wh),
        )
    )

    # scipy oracle with the same cost
    prob = 1.0 / (1.0 + np.exp(-cls_pred))
    eps = 1e-12
    neg = -np.log(1 - prob + eps) * 0.75 * prob**2
    pos = -np.log(prob + eps) * 0.25 * (1 - prob) ** 2
    cost_cls = (pos - neg)[:, gt_labels]
    gt_norm = gt_points / img_wh
    cost_reg = np.abs(pt_pred[:, None] - gt_norm[None]).sum(-1)
    cost = cost_cls + 10.0 * cost_reg
    rows, cols = scipy_lsa(cost)
    want = np.zeros(p, np.int64)
    want[rows] = cols + 1
    np.testing.assert_array_equal(got, want)


def test_hungarian_point_assign_padding():
    p, g, c = 10, 4, 3
    rng = np.random.RandomState(5)
    got = np.asarray(
        hungarian_point_assign(
            jnp.asarray(rng.randn(p, c), jnp.float32),
            jnp.asarray(rng.rand(p, 2), jnp.float32),
            jnp.asarray(rng.rand(g, 2) * 50, jnp.float32),
            jnp.asarray([0, 1, 0, 2], jnp.int32),
            jnp.asarray([True, True, False, False]),
            jnp.asarray([50.0, 50.0]),
        )
    )
    assert (got > 0).sum() == 2  # only the two valid gts matched
    assert set(got[got > 0]) == {1, 2}


# ---------------------------------------------------------------- nms
def test_multiclass_nms():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 9, 9]],
        jnp.float32,
    )
    # class scores: boxes 0,1 class 0; box 2 class 1; box 3 below thr
    scores = np.full((4, 3), 0.01, np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    scores[3, 0] = 0.04
    dets = multiclass_nms(
        boxes, jnp.asarray(scores), score_thr=0.05, iou_threshold=0.5,
        max_per_img=5, pre_nms_top_n=12,
    )
    v = np.asarray(dets.valid)
    assert v.sum() == 2  # box1 suppressed by box0; box3 below threshold
    kept_scores = np.asarray(dets.scores)[v]
    np.testing.assert_allclose(sorted(kept_scores, reverse=True), [0.9, 0.7], rtol=1e-6)
    kept_labels = set(np.asarray(dets.labels)[v].tolist())
    assert kept_labels == {0, 1}


def test_multiclass_nms_class_specific_boxes():
    n, c = 3, 2
    boxes = jnp.asarray(np.tile([[0, 0, 10, 10]], (n, c)).astype(np.float32))
    scores = np.zeros((n, c + 1), np.float32)
    scores[:, 0] = [0.9, 0.85, 0.8]
    dets = multiclass_nms(boxes, jnp.asarray(scores), 0.05, 0.5, 4)
    assert int(np.asarray(dets.valid).sum()) == 1  # identical boxes collapse


# ---------------------------------------------------------------- fpn/rpn
def test_fpn_shapes():
    b, c = 1, 8
    ins = [jnp.zeros((b, 32, 32, c)), jnp.zeros((b, 16, 16, c)),
           jnp.zeros((b, 8, 8, c)), jnp.zeros((b, 4, 4, c))]
    fpn = FPN(out_channels=16, num_outs=5)
    params = fpn.init(KEY, ins)
    outs = fpn.apply(params, ins)
    assert len(outs) == 5
    assert outs[0].shape == (b, 32, 32, 16)
    assert outs[4].shape == (b, 2, 2, 16)


@pytest.mark.slow
def test_rpn_head_and_proposals():
    b = 2
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    feats = [jax.random.normal(KEY, (b, h, w, 16)) for h, w in sizes]
    head = RPNHead(feat_channels=16)
    params = head.init(KEY, feats)
    cls_scores, bbox_preds = head.apply(params, feats)
    assert cls_scores[0].shape == (b, 16, 16, 3)
    assert bbox_preds[0].shape == (b, 16, 16, 12)

    anchors = grid_anchors_per_level(sizes)
    props = rpn_proposals(
        cls_scores, bbox_preds, anchors, img_shape=(64, 64),
        nms_pre=100, max_per_img=50,
    )
    assert props.boxes.shape == (b, 50, 4)
    bx = np.asarray(props.boxes)
    assert (bx[..., 2] >= bx[..., 0]).all() and (bx >= 0).all()
    assert (bx[..., [0, 2]] <= 64).all() and (bx[..., [1, 3]] <= 64).all()
    assert np.asarray(props.valid).any()


@pytest.mark.slow
def test_rpn_loss_runs_and_padding_safe():
    b = 1
    sizes = [(8, 8), (4, 4)]
    feats = [jax.random.normal(KEY, (b, h, w, 16)) for h, w in sizes]
    head = RPNHead(feat_channels=16)
    params = head.init(KEY, feats)
    cls_scores, bbox_preds = head.apply(params, feats)
    anchors = grid_anchors(sizes, strides=(8, 16))
    gt = jnp.asarray([[[4, 4, 40, 40], [0, 0, 0, 0]]], jnp.float32)
    gv = jnp.asarray([[True, False]])
    losses = rpn_loss(KEY, cls_scores, bbox_preds, anchors, gt, gv)
    assert np.isfinite(float(losses["loss_rpn_cls"]))
    assert np.isfinite(float(losses["loss_rpn_bbox"]))
