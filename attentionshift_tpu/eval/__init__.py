from .masks import finalize_detections, paste_masks_np
from .mean_ap_segm import eval_map_segm, mask_iou, voc_ap

__all__ = [
    "finalize_detections",
    "paste_masks_np",
    "eval_map_segm",
    "mask_iou",
    "voc_ap",
]

from .aug_test import AugTester
from .coco_eval import coco_segm_eval
from .mean_ap_segm import eval_map

__all__ += ["AugTester", "coco_segm_eval", "eval_map"]

from .runner import evaluate

__all__ += ["evaluate"]
