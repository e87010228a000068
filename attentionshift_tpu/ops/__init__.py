from .ccl import connected_components
from .image import resize, resize_weight_matrix
from .masks import box2mask, corrosion, expansion, paste_masks
from .nms import batched_nms, box_iou, nms
from .roi_align import roi_align
from .sampling import grid_sample_bilinear, point_sample

__all__ = [
    "connected_components",
    "resize",
    "resize_weight_matrix",
    "box2mask",
    "corrosion",
    "expansion",
    "paste_masks",
    "batched_nms",
    "box_iou",
    "nms",
    "roi_align",
    "grid_sample_bilinear",
    "point_sample",
]

from .attention import attention_with_capture

__all__.append("attention_with_capture")
