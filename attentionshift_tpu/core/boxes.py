"""Box toolbox: format conversion, overlaps, delta coding.

TPU-idiomatic equivalents of mmdet's `mmdet/core/bbox/` utilities used on
the active path: ``bbox_overlaps``, ``DeltaXYWHBBoxCoder``
(`core/bbox/coder/delta_xywh_bbox_coder.py`), xyxy<->cxcywh transforms.
All functions are pure, fixed-shape, and safe under vmap/jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "bbox_overlaps",
    "xyxy_to_cxcywh",
    "cxcywh_to_xyxy",
    "delta2bbox",
    "bbox2delta",
    "clip_boxes",
    "point_coords_wrt_box",
]


def point_coords_wrt_box(boxes: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Image-absolute points -> box-normalised [0,1]^2 coordinates.

    Exact rebuild of ``get_point_coords_wrt_box``
    (`stdroi_point_deform_attn_reppoints.py:1157-1181`): no epsilon on the
    box extent (degenerate boxes produce inf/nan exactly as the reference
    does — callers mask those points as ignore).

    Args:
        boxes: (R, 4) xyxy; points: (R, P, 2) absolute xy.

    Returns:
        (R, P, 2) box-normalised xy.
    """
    wh = boxes[:, None, 2:4] - boxes[:, None, 0:2]
    return (points - boxes[:, None, 0:2]) / wh


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    cx = (b[..., 0] + b[..., 2]) / 2
    cy = (b[..., 1] + b[..., 3]) / 2
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([cx, cy, w, h], axis=-1)


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_overlaps(
    a: jnp.ndarray, b: jnp.ndarray, mode: str = "iou", eps: float = 1e-6
) -> jnp.ndarray:
    """Pairwise overlaps (N, 4) x (M, 4) -> (N, M); mode 'iou'|'iof'|'giou'."""
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:4], b[..., None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iof":
        return inter / jnp.maximum(area_a[..., :, None], eps)
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.maximum(union, eps)
    if mode == "iou":
        return iou
    if mode == "giou":
        lt_c = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
        rb_c = jnp.maximum(a[..., :, None, 2:4], b[..., None, :, 2:4])
        wh_c = jnp.maximum(rb_c - lt_c, 0.0)
        area_c = jnp.maximum(wh_c[..., 0] * wh_c[..., 1], eps)
        return iou - (area_c - union) / area_c
    raise ValueError(f"unknown mode {mode}")


def bbox2delta(
    proposals: jnp.ndarray,
    gt: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode gt boxes as deltas wrt proposals (DeltaXYWHBBoxCoder.encode)."""
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    dx = (gx - px) / jnp.maximum(pw, 1e-6)
    dy = (gy - py) / jnp.maximum(ph, 1e-6)
    dw = jnp.log(jnp.maximum(gw, 1e-6) / jnp.maximum(pw, 1e-6))
    dh = jnp.log(jnp.maximum(gh, 1e-6) / jnp.maximum(ph, 1e-6))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(
    rois: jnp.ndarray,
    deltas: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape=None,
    wh_ratio_clip: float = 16 / 1000,
) -> jnp.ndarray:
    """Decode deltas into boxes (DeltaXYWHBBoxCoder.decode)."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = jnp.abs(jnp.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy
    boxes = jnp.stack(
        [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5], axis=-1
    )
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def clip_boxes(boxes: jnp.ndarray, max_shape) -> jnp.ndarray:
    """Clamp xyxy boxes to [0, W] x [0, H]; max_shape = (H, W)."""
    h, w = max_shape[0], max_shape[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
