"""Detection CAM visualisation: grad-CAM / EigenCAM / FeatmapAM.

Rebuild of the reference's ``DetCAMVisualizer`` machinery
(`mmdet_plugins/utils/det_cam_visualizer.py`): a differentiable
box-match score target (``DetBoxScoreTarget``, `det_cam_visualizer.py:
373-447`) plus the CAM methods it routes through pytorch_grad_cam —
gradient-weighted class activation maps (grad-CAM), the gradient-free
EigenCAM (`:451-468`) and FeatmapAM channel-mean (`:470-495`).

TPU-native design: instead of forward/backward hooks on a target layer,
the detector's ``test_from_feats`` split makes the backbone activation
an explicit function input, so grad-CAM is one ``jax.grad`` of the
score w.r.t. that activation — no hook machinery, jits end to end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "det_box_score",
    "grad_cam",
    "eigen_cam",
    "featmap_am",
    "cam_on_image",
]


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: jnp.maximum(x[:, 2] - x[:, 0], 0) * jnp.maximum(x[:, 3] - x[:, 1], 0)
    return inter / jnp.maximum(area(a)[:, None] + area(b)[None] - inter, 1e-6)


def det_box_score(
    det_boxes: jnp.ndarray,
    det_scores: jnp.ndarray,
    det_labels: jnp.ndarray,
    det_valid: jnp.ndarray,
    focal_boxes: jnp.ndarray,
    focal_labels: jnp.ndarray,
    det_masks: jnp.ndarray | None = None,
    focal_masks: jnp.ndarray | None = None,
    match_iou_thr: float = 0.5,
) -> jnp.ndarray:
    """Differentiable ``DetBoxScoreTarget`` (`det_cam_visualizer.py:402-447`).

    For every focal box: find the best-IoU detection; if IoU >
    ``match_iou_thr`` and the label matches, add ``IoU + det score``
    (+ the mask-overlap dice term when masks are given). Sum over focal
    boxes. Non-matching focal boxes contribute 0 — same semantics as the
    reference, but expressed with masked ``where`` so gradients flow.
    """
    ious = _pairwise_iou(focal_boxes, det_boxes)  # (F, K)
    ious = jnp.where(det_valid[None, :], ious, 0.0)
    best = jnp.argmax(ious, axis=1)  # (F,)
    best_iou = jnp.take_along_axis(ious, best[:, None], axis=1)[:, 0]
    best_label = det_labels[best]
    best_score = det_scores[best]
    ok = (best_iou > match_iou_thr) & (best_label == focal_labels)
    score = jnp.where(ok, best_iou + best_score, 0.0)
    if det_masks is not None and focal_masks is not None:
        dm = det_masks[best]  # (F, h, w)
        inter = (focal_masks * dm).sum(axis=(1, 2))
        denom = focal_masks.sum(axis=(1, 2)) + dm.sum(axis=(1, 2)) + 1e-7
        score = score + jnp.where(ok, inter / denom, 0.0)
    return score.sum()


def grad_cam(
    model,
    params,
    img: jnp.ndarray,
    img_wh: jnp.ndarray,
    focal_boxes: jnp.ndarray,
    focal_labels: jnp.ndarray,
    match_iou_thr: float = 0.5,
) -> np.ndarray:
    """Grad-CAM of the detection score on the RoI feature map.

    Runs the backbone once, then differentiates the box-match score
    through ``test_from_feats`` w.r.t. ``roi_map`` (the raw last-block
    token grid the RoI heads consume — the natural "target layer"; the
    reference hooks the backbone the same way via ``target_layers``).
    Weights = spatial mean of the gradient per channel; cam =
    relu(sum_c w_c * act_c), max-normalised.

    Args:
        img: (1, H, W, 3) preprocessed image.
        focal_boxes: (F, 4) boxes to explain; focal_labels: (F,).

    Returns:
        (Hp, Wp) float32 cam in [0, 1] on the feature grid.
    """
    b, h, w, _ = img.shape

    out, roi_map, _ = model.apply(
        params, method=lambda m: m._extract(img, deterministic=True)
    )

    def score_fn(rm):
        t = model.apply(
            params, out, rm, img_wh, (h, w), method=type(model).test_from_feats
        )
        return det_box_score(
            t.dets.boxes[0], t.dets.scores[0], t.dets.labels[0],
            t.dets.valid[0], focal_boxes, focal_labels,
            match_iou_thr=match_iou_thr,
        )

    grads = jax.grad(score_fn)(roi_map)  # (B, D, Hp, Wp)
    act = np.asarray(roi_map[0], np.float32)  # (D, Hp, Wp)
    g = np.asarray(grads[0], np.float32)
    weights = g.mean(axis=(1, 2))  # (D,)
    cam = np.maximum((weights[:, None, None] * act).sum(axis=0), 0.0)
    return cam / max(cam.max(), 1e-6)


def eigen_cam(activations: np.ndarray) -> np.ndarray:
    """EigenCAM (`det_cam_visualizer.py:451-468`): project activations
    on their first principal component (gradient-free).

    Args:
        activations: (C, H, W) feature map.

    Returns: (H, W) cam in [0, 1].
    """
    c, h, w = activations.shape
    acts = np.asarray(activations, np.float32)
    x = acts.reshape(c, h * w).T  # (HW, C)
    x = x - x.mean(axis=0, keepdims=True)
    # first right-singular vector of the centred (HW, C) matrix
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[0]
    # SVD sign is arbitrary: orient so the projection agrees with the
    # activation energy (channel-mean map), then relu + min-max scale —
    # the pytorch_grad_cam BaseCAM postprocess the reference routes
    # EigenCAM through (get_2d_projection -> relu -> scale_cam_image)
    energy = acts.mean(axis=0).reshape(h * w)
    if np.dot(proj, energy - energy.mean()) < 0:
        proj = -proj
    cam = np.maximum(proj.reshape(h, w), 0.0)
    cam = cam - cam.min()
    return cam / max(cam.max(), 1e-6)


def featmap_am(activations: np.ndarray) -> np.ndarray:
    """FeatmapAM (`det_cam_visualizer.py:470-495`): channel-mean
    activation map, max-normalised to [0, 1]."""
    cam = np.asarray(activations, np.float32).mean(axis=0)
    cam = cam - cam.min()
    return cam / max(cam.max(), 1e-6)


def cam_on_image(img: np.ndarray, cam: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Resize a feature-grid cam to the image and overlay it
    (`DetCAMVisualizer.show_cam` rendering, minus the window)."""
    from PIL import Image

    from .visualize import overlay_heatmap

    h, w = img.shape[:2]
    heat = np.asarray(
        Image.fromarray((cam * 255).astype(np.uint8)).resize((w, h), Image.BILINEAR),
        np.float32,
    ) / 255.0
    return overlay_heatmap(img, heat, alpha=alpha)
