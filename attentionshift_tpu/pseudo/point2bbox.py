"""Test-time point -> box decoding (the alternative inference path).

Rebuild of ``point2bbox`` + ``get_multi_bboxes``
(`stdroi_point_deform_attn_reppoints.py:1493-1569,1197-1260`): instead of
the RPN/RCNN pipeline, detections come straight from the point tokens —
tokens whose max sigmoid class score clears ``seed_score_thr`` become
instances; each one's rollout CAM is thresholded, connected components
with area >= ratio * max are kept, and the union extent is mirrored
around the predicted point (the same "expand" rule as training Stage A).
Fixed-shape: all P tokens are decoded, low-score ones masked out.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cam import bbox_from_cam

__all__ = ["point2bbox", "PointDetections"]


class PointDetections(NamedTuple):
    boxes: jnp.ndarray  # (P, 4)
    scores: jnp.ndarray  # (P,)
    labels: jnp.ndarray  # (P,) int32
    valid: jnp.ndarray  # (P,) bool


def point2bbox(
    point_cls: jnp.ndarray,
    point_reg: jnp.ndarray,
    rollout_rows: jnp.ndarray,
    patch_hw: tuple[int, int],
    img_wh: jnp.ndarray,
    seed_score_thr: float = 0.05,
    seed_thr: float = 0.2,
    seed_multiple: float = 0.5,
    cam_stride: int = 8,
    ccl_iters: int = 64,
) -> PointDetections:
    """One image.

    Args:
        point_cls: (P, C) point-token logits; point_reg: (P, 2) in [0,1].
        rollout_rows: (P, T) final-layer rollout rows (cls|patches|points).
        patch_hw: (Hp, Wp); img_wh: (2,) true (w, h).
    """
    from ..ops.image import resize

    p, c = point_cls.shape
    hp, wp = patch_hw
    n_patch = hp * wp
    probs = jax.nn.sigmoid(point_cls)
    scores = probs.max(-1)
    labels = jnp.argmax(probs, -1).astype(jnp.int32)
    keep = scores >= seed_score_thr
    points = point_reg * img_wh[None, :]  # (P, 2) absolute xy

    cams = rollout_rows[:, 1 : 1 + n_patch].reshape(p, hp, wp)
    h = hp * 16
    w = wp * 16
    sh, sw = h // cam_stride, w // cam_stride
    cams_up = resize(cams, (sh, sw))

    def one(cam, pt):
        box = bbox_from_cam(
            cam, pt / cam_stride, cam_thr=seed_thr, area_ratio=seed_multiple,
            ccl_iters=ccl_iters,
        )
        return box * cam_stride

    boxes = jax.vmap(one)(cams_up, points)
    # clip to the true image area
    wmax, hmax = img_wh[0], img_wh[1]
    boxes = jnp.stack(
        [
            jnp.clip(boxes[:, 0], 0, wmax),
            jnp.clip(boxes[:, 1], 0, hmax),
            jnp.clip(boxes[:, 2], 0, wmax),
            jnp.clip(boxes[:, 3], 0, hmax),
        ],
        axis=-1,
    )
    return PointDetections(boxes=boxes, scores=scores, labels=labels, valid=keep)
