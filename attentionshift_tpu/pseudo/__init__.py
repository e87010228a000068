from .cam import bbox_from_cam, norm_attns, normalize_cam
from .meanshift import (
    SemanticCenters,
    cosine_shift_batch,
    filter_maps,
    get_center_coords,
    mean_shift_grid_prototype,
    merge_maps,
    semantic_centers,
)
from .points import sample_in_mask, strided_in_mask, topk_in_mask
from .refine import (
    RefinedMaps,
    cosine_similarity_refined_map,
    decouple_instance,
    point_prototype_sim,
    refined_similarity,
    sample_fgbg_points,
    sample_mask_points,
)
from .rollout import attention_rollout_point_rows, augment_attention

__all__ = [
    "attention_rollout_point_rows",
    "augment_attention",
    "bbox_from_cam",
    "norm_attns",
    "normalize_cam",
    "SemanticCenters",
    "cosine_shift_batch",
    "filter_maps",
    "get_center_coords",
    "mean_shift_grid_prototype",
    "merge_maps",
    "semantic_centers",
    "sample_in_mask",
    "strided_in_mask",
    "topk_in_mask",
    "RefinedMaps",
    "cosine_similarity_refined_map",
    "decouple_instance",
    "point_prototype_sim",
    "refined_similarity",
    "sample_fgbg_points",
    "sample_mask_points",
]

from .engine import PseudoLabels, candidate_boxes, masks_and_centers
from .crf import feature_affinity, mean_field_refine
from .point2bbox import PointDetections, point2bbox

__all__ += [
    "PseudoLabels", "candidate_boxes", "masks_and_centers",
    "feature_affinity", "mean_field_refine", "PointDetections", "point2bbox",
]
