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

    def body(i, state):
        alive, keep_idx, keep_valid = state
        masked = jnp.where(alive, scores, -jnp.inf)
        best = jnp.argmax(masked)
        ok = masked[best] > -jnp.inf
        keep_idx = keep_idx.at[i].set(jnp.where(ok, best, 0))
        keep_valid = keep_valid.at[i].set(ok)
        suppress = iou[best] > iou_threshold
        alive = alive & ~suppress & (jnp.arange(n) != best)
        alive = jnp.where(ok, alive, jnp.zeros_like(alive))
        return alive, keep_idx, keep_valid

    keep_idx = jnp.zeros((max_out,), dtype=jnp.int32)
    keep_valid = jnp.zeros((max_out,), dtype=jnp.bool_)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_out, body, (alive, keep_idx, keep_valid)
    )
    return keep_idx, keep_valid


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
