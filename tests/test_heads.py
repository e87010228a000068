"""Tests for the RoI sub-heads (MIL, box-rec, point-sup mask)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from attentionshift_tpu.core.boxes import bbox2delta
from attentionshift_tpu.models.heads import (
    BoxHeadRec,
    MILHead,
    MaskHeadPointSup,
    mask_point_loss,
)

KEY = jax.random.PRNGKey(0)


def test_mil_head_shapes_and_padding_invariance():
    head = MILHead(num_classes=20, num_layers_query=7)
    G, L, S, C = 3, 7, 7, 384
    feats = jax.random.normal(KEY, (G, L, S, S, C))
    labels = jnp.asarray([2, 5, 0], jnp.int32)
    valid = jnp.asarray([True, True, False])
    params = head.init(KEY, feats, labels, valid)
    best, loss = head.apply(params, feats, labels, valid)
    assert best.shape == (G,)
    assert (np.asarray(best) >= 0).all() and (np.asarray(best) < L).all()
    # padding invariance: garbage in the invalid slot must not move the loss
    feats2 = feats.at[2].set(jax.random.normal(jax.random.PRNGKey(9), (L, S, S, C)) * 50)
    _, loss2 = head.apply(params, feats2, labels, valid)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)


def test_mil_head_selects_discriminative_layer():
    """A layer whose features align with the class weight vector wins."""
    head = MILHead(num_classes=4, num_layers_query=3, in_channels=16, embed_dim=16,
                   hidden_dim=32, roi_size=2)
    G, L, S, C = 1, 3, 2, 16
    feats = jnp.zeros((G, L, S, S, C))
    labels = jnp.asarray([1], jnp.int32)
    valid = jnp.ones((G,), bool)
    params = head.init(KEY, feats, labels, valid)
    # make layer 2 produce a distinct activation pattern
    feats = feats.at[0, 2].set(1.0)
    best, loss = head.apply(params, feats, labels, valid)
    bag_best = int(best[0])
    assert 0 <= bag_best < L
    assert np.isfinite(float(loss))


def test_mil_head_saturated_bag_stays_finite_bf16():
    """Regression (round 5): a confident bf16 MIL head saturates
    ``bag_sum`` to exactly 1.0 (the 1 - 1e-6 clip bound rounds to 1.0 in
    bf16), and the one-hot column then computed 0 * log(0) = NaN —
    silently freezing ALL training through ``optax.apply_if_finite``.
    The bag chain must run in f32: loss AND grads finite at saturation.
    """
    head = MILHead(num_classes=4, num_layers_query=3, in_channels=16,
                   embed_dim=16, hidden_dim=32, roi_size=2,
                   dtype=jnp.bfloat16)
    G, L, S, C = 2, 3, 2, 16
    feats = jax.random.normal(KEY, (G, L, S, S, C)) * 1e4  # saturating
    labels = jnp.asarray([1, 3], jnp.int32)
    valid = jnp.ones((G,), bool)
    params = head.init(KEY, feats, labels, valid)

    def loss_fn(p):
        return head.apply(p, feats, labels, valid)[1]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)), float(loss)
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in leaves)


@pytest.mark.slow
def test_box_head_shapes():
    head = BoxHeadRec(num_classes=20)
    R, S, C = 4, 7, 384
    feats = jax.random.normal(KEY, (R, S, S, C))
    params = head.init(KEY, feats)
    cls_score, bbox_pred, rec = head.apply(params, feats)
    assert cls_score.shape == (R, 21)
    assert bbox_pred.shape == (R, 80)
    assert rec is None


def test_box_head_loss_perfect_pred_zero_giou():
    head = BoxHeadRec(num_classes=4)
    R = 3
    rois = jnp.asarray([[0, 0, 20, 20], [10, 10, 40, 30], [5, 5, 9, 9]], jnp.float32)
    targets = jnp.asarray([[2, 2, 18, 22], [8, 12, 44, 28], [0, 0, 1, 1]], jnp.float32)
    labels = jnp.asarray([1, 3, 4], jnp.int32)  # last is background
    stds = (0.1, 0.1, 0.2, 0.2)
    # craft per-class deltas so the selected class decodes exactly to target
    deltas = bbox2delta(rois, targets, stds=stds)
    bbox_pred = jnp.zeros((R, 16))
    for i, c in enumerate([1, 3, 0]):
        bbox_pred = bbox_pred.at[i, 4 * c : 4 * c + 4].set(deltas[i])
    cls_score = jnp.full((R, 5), -10.0)
    cls_score = cls_score.at[jnp.arange(R), labels].set(10.0)
    lw = jnp.ones((R,))
    bw = jnp.asarray([[1.0] * 4, [1.0] * 4, [0.0] * 4])
    losses = head.loss(cls_score, bbox_pred, rois, labels, lw, targets, bw)
    assert float(losses["loss_bbox"]) < 1e-4  # giou(pred == target) = 0
    assert float(losses["loss_cls"]) < 1e-3
    assert float(losses["acc"]) == 100.0


@pytest.mark.slow
def test_box_head_loss_enable_gate():
    head = BoxHeadRec(num_classes=4)
    R = 2
    feats = jax.random.normal(KEY, (R, 7, 7, 384))
    params = head.init(KEY, feats)
    cls_score, bbox_pred, _ = head.apply(params, feats)
    rois = jnp.asarray([[0, 0, 20, 20], [0, 0, 10, 10]], jnp.float32)
    labels = jnp.asarray([1, 2], jnp.int32)
    lw = jnp.ones((R,))
    tgt = rois
    bw = jnp.ones((R, 4))
    l_on = head.loss(cls_score, bbox_pred, rois, labels, lw, tgt, bw, loss_enable=1.0)
    l_off = head.loss(cls_score, bbox_pred, rois, labels, lw, tgt, bw, loss_enable=0.0)
    assert float(l_off["loss_cls"]) == 0.0 and float(l_off["loss_bbox"]) == 0.0
    assert float(l_on["loss_cls"]) > 0.0


def test_mask_head_shapes():
    head = MaskHeadPointSup(num_classes=20)
    R, S, C = 2, 14, 384
    feats = jax.random.normal(KEY, (R, S, S, C))
    params = head.init(KEY, feats)
    logits = head.apply(params, feats)
    assert logits.shape == (R, 28, 28, 20)
    assert np.isfinite(np.asarray(logits)).all()


def test_mask_point_loss_semantics():
    R, P, C = 2, 6, 3
    preds = jnp.zeros((R, P, C))  # sigmoid(0) = 0.5 -> bce = log(2)
    labels = jnp.asarray([0, 2], jnp.int32)
    # targets: row0 all real; row1 half ignored
    tgt = jnp.asarray([[0, 1, 0, 1, 0, 1], [2, 2, 2, 0, 1, 0]], jnp.int32)
    valid = jnp.ones((R,), bool)
    loss = float(mask_point_loss(preds, tgt, labels, valid))
    # reference semantics: mean over ALL R*P elements, ignored zeroed
    want = np.log(2.0) * 9 / 12
    np.testing.assert_allclose(loss, want, rtol=1e-6)

    # padding row excluded from numerator AND denominator via pos_valid
    valid2 = jnp.asarray([True, False])
    loss2 = float(mask_point_loss(preds, tgt, labels, valid2))
    np.testing.assert_allclose(loss2, np.log(2.0) * 6 / 6, rtol=1e-6)

    # all-ignored, all-padded -> exact zero, no NaN
    loss3 = float(
        mask_point_loss(preds, jnp.full((R, P), 2), labels, jnp.zeros((R,), bool))
    )
    assert loss3 == 0.0


def test_reconstruction_loss():
    from attentionshift_tpu.models.heads import reconstruction_loss

    rng = np.random.RandomState(0)
    R, S, P = 2, 4, 16
    img = jnp.asarray(rng.randn(1, 128, 128, 3), jnp.float32)
    rois = jnp.asarray([[0, 8, 8, 72, 72], [0, 16, 16, 80, 80]], jnp.float32)
    valid = jnp.asarray([True, True])
    pred = jnp.asarray(rng.randn(R, S, S, 3 * P * P), jnp.float32)
    l = reconstruction_loss(pred, rois, img, valid)
    assert np.isfinite(float(l)) and float(l) > 0
    # invalid rois contribute nothing
    l0 = reconstruction_loss(pred, rois, img, jnp.asarray([False, False]))
    assert float(l0) == 0.0
