"""Loss functions with mmdet-compatible semantics.

Covers the losses on the reference's active path
(`configs/mae/attnshift_voc12aug.py:55-57,112-121,142-143`): sigmoid focal
loss, softmax / sigmoid cross-entropy, L1, GIoU, and the
point-supervised BCE mask loss with ignore label 2
(`mae_mask_head_pointSup.py:233-274`). All take explicit weights and an
``avg_factor`` like mmdet, but operate on fixed-shape padded tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

__all__ = [
    "sigmoid_focal_loss",
    "softmax_cross_entropy",
    "binary_cross_entropy",
    "l1_loss",
    "smooth_l1_loss",
    "giou_loss",
    "accuracy",
    "mask_point_bce_loss",
]


def _reduce(loss: jnp.ndarray, weight, avg_factor) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return loss.mean()
    return loss.sum() / jnp.maximum(avg_factor, 1e-6)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight=None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    avg_factor=None,
) -> jnp.ndarray:
    """mmdet FocalLoss(use_sigmoid=True).

    ``labels`` are int class ids in [0, C] where C (== num_classes) means
    background (no positive target).
    """
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt**gamma
    ce = _bce_with_logits(logits, onehot)
    loss = (ce * focal_weight).sum(-1)
    return _reduce(loss, weight, avg_factor)


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weight=None,
    avg_factor=None,
) -> jnp.ndarray:
    """mmdet CrossEntropyLoss(use_sigmoid=False); labels are class ids."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return _reduce(nll, weight, avg_factor)


def binary_cross_entropy(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight=None,
    avg_factor=None,
) -> jnp.ndarray:
    """mmdet CrossEntropyLoss(use_sigmoid=True) with {0,1} float targets."""
    loss = _bce_with_logits(logits, targets.astype(logits.dtype))
    if loss.ndim > targets.ndim:
        loss = loss.sum(-1)
    return _reduce(loss, weight, avg_factor)


def l1_loss(pred, target, weight=None, avg_factor=None):
    loss = jnp.abs(pred - target)
    return _reduce(loss, weight, avg_factor)


def smooth_l1_loss(pred, target, beta: float = 1.0, weight=None, avg_factor=None):
    """mmdet SmoothL1Loss: 0.5x^2/beta below beta, |x| - beta/2 above."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weight is None and avg_factor is None:
        return loss
    return _reduce(loss, weight, avg_factor)


def giou_loss(pred, target, weight=None, avg_factor=None, eps: float = 1e-7):
    """1 - GIoU on aligned (N, 4) xyxy pairs (mmdet GIoULoss)."""
    giou = bbox_overlaps(pred[:, None, :], target[:, None, :], mode="giou", eps=eps)[
        :, 0, 0
    ]
    loss = 1.0 - giou
    return _reduce(loss, weight, avg_factor)


def accuracy(logits, labels, mask=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if mask is not None:
        return (correct * mask).sum() / jnp.maximum(mask.sum(), 1.0) * 100.0
    return correct.mean() * 100.0


def mask_point_bce_loss(
    point_logits: jnp.ndarray,
    point_targets: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Point-supervised mask BCE (`mae_mask_head_pointSup.py:253-274`).

    Args:
        point_logits: (N, C, P) per-class logits sampled at points.
        point_targets: (N, P) targets in {0, 1, 2}; 2 = ignore
            (out-of-box points, `stdroi_point_deform_attn_reppoints.py:3146-3152`).
        labels: (N,) class id per roi, selecting the logit channel.
        valid: optional (N,) roi validity mask (padding).
    """
    n = point_logits.shape[0]
    sel = point_logits[jnp.arange(n), labels]  # (N, P)
    ignore = point_targets == 2
    w = (~ignore).astype(sel.dtype)
    if valid is not None:
        w = w * valid[:, None].astype(sel.dtype)
    tgt = jnp.where(ignore, 0, point_targets).astype(sel.dtype)
    loss = _bce_with_logits(sel, tgt)
    # reference uses weighted mean over ALL points (weight zero on ignores,
    # denominator = total element count)
    denom = jnp.asarray(sel.size, sel.dtype)
    if valid is not None:
        denom = jnp.maximum(valid.sum() * sel.shape[1], 1.0)
    return (loss * w).sum() / denom
