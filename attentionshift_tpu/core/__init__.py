from .boxes import (
    bbox2delta,
    bbox_overlaps,
    clip_boxes,
    cxcywh_to_xyxy,
    delta2bbox,
    xyxy_to_cxcywh,
)
from .losses import (
    accuracy,
    binary_cross_entropy,
    giou_loss,
    l1_loss,
    mask_point_bce_loss,
    sigmoid_focal_loss,
    softmax_cross_entropy,
)
from .lsa import linear_sum_assignment

__all__ = [
    "bbox2delta",
    "bbox_overlaps",
    "clip_boxes",
    "cxcywh_to_xyxy",
    "delta2bbox",
    "xyxy_to_cxcywh",
    "accuracy",
    "binary_cross_entropy",
    "giou_loss",
    "l1_loss",
    "mask_point_bce_loss",
    "sigmoid_focal_loss",
    "softmax_cross_entropy",
    "linear_sum_assignment",
]
