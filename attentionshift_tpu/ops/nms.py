"""Fixed-shape NMS for jit/TPU.

Replaces ``mmcv.ops.nms`` / mmdet ``batched_nms`` (RPN proposals and RCNN
test, `mmdet/core/post_processing/bbox_nms.py`). The reference runs
dynamic-shape CUDA NMS; on TPU everything is static: we select up to
``max_out`` boxes via a ``fori_loop`` of argmax + IoU suppression, and
return padded indices plus a validity mask. Class-aware behaviour uses the
standard coordinate-offset trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["nms", "batched_nms", "box_iou"]


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS.

    Args:
        boxes: (N, 4) xyxy.
        scores: (N,).
        iou_threshold: suppression threshold.
        max_out: number of kept slots (static).
        valid: optional (N,) bool mask of candidate validity.

    Returns:
        keep_idx: (max_out,) int32 indices into the input (0 for padding),
        keep_valid: (max_out,) bool mask of real selections.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)
    alive = jnp.ones((n,), dtype=jnp.bool_) if valid is None else valid.astype(jnp.bool_)

    # EXACT greedy NMS as a suppression fixpoint instead of max_out
    # sequential argmax iterations (round 4: the old loop cost ~11 ms of
    # serialized op latency at the RPN's 2000->1000 shape; this converges
    # in <= longest-suppression-chain iterations, typically < 20, each a
    # vectorized (N, N) masked reduce). Greedy keeps box i iff no KEPT
    # higher-precedence box suppresses it — a triangular recurrence whose
    # unique fixpoint the while_loop below reaches; precedence replicates
    # argmax tie semantics (higher score wins, first index on ties).
    idx = jnp.arange(n)
    prec = (scores[:, None] > scores[None, :]) | (
        (scores[:, None] == scores[None, :]) & (idx[:, None] < idx[None, :])
    )  # prec[j, i]: j is selected before i by the greedy scan
    sup = prec & (iou > iou_threshold) & alive[:, None] & alive[None, :]

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < n)

    def body(state):
        kept, _, it = state
        new = alive & ~jnp.any(sup & kept[:, None], axis=0)
        return new, jnp.any(new != kept), it + 1

    kept, _, _ = jax.lax.while_loop(cond, body, (alive, jnp.bool_(True), 0))

    # emit in the greedy selection order = kept boxes by (score desc,
    # index asc); top_k is stable (first index wins ties)
    k = min(max_out, n)
    top_scores, keep_idx = jax.lax.top_k(
        jnp.where(kept, scores, -jnp.inf), k
    )
    if k < max_out:
        top_scores = jnp.pad(top_scores, (0, max_out - k),
                             constant_values=-jnp.inf)
        keep_idx = jnp.pad(keep_idx, (0, max_out - k))
    keep_valid = top_scores > -jnp.inf
    return (jnp.where(keep_valid, keep_idx, 0).astype(jnp.int32), keep_valid)


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Category/level-aware NMS via the coordinate-offset trick.

    ``idxs`` (N,) int labels; boxes from different idx never suppress each
    other (mmdet ``batched_nms`` semantics).
    """
    span = jnp.max(jnp.maximum(boxes[:, 2], boxes[:, 3])) + 1.0
    offsets = idxs.astype(boxes.dtype)[:, None] * span
    shifted = boxes + offsets
    return nms(shifted, scores, iou_threshold, max_out, valid=valid)
