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

from .anchors import anchor_valid_flags, base_anchors, grid_anchors, grid_anchors_per_level
from .assign import AssignResult, SampleResult, hungarian_point_assign, max_iou_assign, random_sample
from .losses_geom import chamfer_distance, chamfer_loss, info_nce_loss, pts_border_loss, sim_masked_chamfer_loss
from .postprocess import Detections, multiclass_nms
from .sinkhorn import semantic_correspondence, sinkhorn

__all__ += [
    "anchor_valid_flags", "base_anchors", "grid_anchors", "grid_anchors_per_level",
    "AssignResult", "SampleResult", "hungarian_point_assign", "max_iou_assign", "random_sample",
    "chamfer_distance", "chamfer_loss", "info_nce_loss", "pts_border_loss", "sim_masked_chamfer_loss",
    "Detections", "multiclass_nms", "semantic_correspondence", "sinkhorn",
]
