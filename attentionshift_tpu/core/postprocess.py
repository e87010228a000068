"""Detection post-processing: multiclass NMS (fixed-shape).

Rebuilds mmdet ``multiclass_nms`` (`mmdet/core/post_processing/
bbox_nms.py`) with static shapes: a score-threshold mask + global top-k
pre-selection replaces dynamic filtering, then class-aware greedy NMS
over the fixed candidate set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms

__all__ = ["multiclass_nms", "Detections"]


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (K, 4)
    scores: jnp.ndarray  # (K,)
    labels: jnp.ndarray  # (K,) int32
    valid: jnp.ndarray  # (K,) bool


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    pre_nms_top_n: int = 1000,
    box_valid: jnp.ndarray | None = None,
) -> Detections:
    """Args:
        boxes: (N, C*4) class-specific or (N, 4) agnostic xyxy.
        scores: (N, C+1) softmax probabilities, last column = background.
        score_thr: per-candidate score floor (0.05 in the VOC config).
        pre_nms_top_n: static candidate cap before the O(K^2) NMS.
        box_valid: optional (N,) validity of the input rows.

    Returns fixed-size ``Detections`` with ``max_per_img`` slots.
    """
    n, num_cls_p1 = scores.shape
    c = num_cls_p1 - 1
    cls_scores = scores[:, :c]  # drop background
    if boxes.shape[-1] == 4:
        cand_boxes = jnp.broadcast_to(boxes[:, None, :], (n, c, 4))
    else:
        cand_boxes = boxes.reshape(n, c, 4)
    cand_boxes = cand_boxes.reshape(n * c, 4)
    cand_scores = cls_scores.reshape(n * c)
    cand_labels = jnp.tile(jnp.arange(c, dtype=jnp.int32), (n,))
    ok = cand_scores > score_thr
    if box_valid is not None:
        ok &= jnp.repeat(box_valid, c)

    k = min(pre_nms_top_n, n * c)
    top_scores, top_idx = jax.lax.top_k(jnp.where(ok, cand_scores, -1.0), k)
    top_boxes = cand_boxes[top_idx]
    top_labels = cand_labels[top_idx]
    top_valid = top_scores > 0.0

    keep_idx, keep_valid = batched_nms(
        top_boxes, top_scores, top_labels, iou_threshold, max_per_img, valid=top_valid
    )
    return Detections(
        boxes=top_boxes[keep_idx],
        scores=jnp.where(keep_valid, top_scores[keep_idx], 0.0),
        labels=top_labels[keep_idx],
        valid=keep_valid,
    )
