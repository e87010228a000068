"""Visualisation of pseudo labels / attention / detections.

Rebuild of the reference's debugging surfaces: the detector/RoI-head
``visualize`` stash (`two_stage_point_align.py:98-118`,
`stdroi:2366-2372`), the fg-map matplotlib dumps (`stdroi:2687-2717`) and
``DetCAMVisualizer`` (`mmdet_plugins/utils/det_cam_visualizer.py`). All
host-side numpy/PIL — no display needed; everything lands as pngs.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageDraw

__all__ = ["denormalize", "draw_detections", "overlay_heatmap", "dump_pseudo_labels"]

_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
_STD = np.asarray([58.395, 57.12, 57.375], np.float32)

_COLORS = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (250, 190, 190), (0, 128, 128), (170, 110, 40),
]


def denormalize(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) normalised float -> uint8 RGB."""
    return np.clip(img * _STD + _MEAN, 0, 255).astype(np.uint8)


def overlay_heatmap(img: np.ndarray, heat: np.ndarray, alpha: float = 0.5) -> np.ndarray:
    """Blend a (H, W) map (auto-normalised, red channel) over the image."""
    h = heat.astype(np.float32)
    h = (h - h.min()) / max(h.max() - h.min(), 1e-6)
    if h.shape != img.shape[:2]:
        h = np.asarray(Image.fromarray((h * 255).astype(np.uint8)).resize(
            (img.shape[1], img.shape[0]))) / 255.0
    color = np.zeros_like(img, np.float32)
    color[..., 0] = h * 255
    color[..., 2] = (1 - h) * 128
    return np.clip(img * (1 - alpha * h[..., None]) + color * alpha * h[..., None],
                   0, 255).astype(np.uint8)


def draw_detections(
    img: np.ndarray,
    boxes: np.ndarray,
    labels: np.ndarray | None = None,
    scores: np.ndarray | None = None,
    points: np.ndarray | None = None,
    masks: np.ndarray | None = None,
    class_names=None,
) -> np.ndarray:
    """Draw boxes/points/masks on a uint8 RGB image; returns a copy."""
    out = img.copy()
    if masks is not None:
        for i, m in enumerate(masks):
            color = np.asarray(_COLORS[i % len(_COLORS)], np.float32)
            out = np.where(
                m[..., None], (0.5 * out + 0.5 * color).astype(np.uint8), out
            )
    pil = Image.fromarray(out)
    d = ImageDraw.Draw(pil)
    for i, box in enumerate(np.asarray(boxes)):
        color = _COLORS[i % len(_COLORS)]
        d.rectangle([float(box[0]), float(box[1]), float(box[2]), float(box[3])],
                    outline=color, width=2)
        txt = ""
        if labels is not None:
            li = int(labels[i])
            txt = class_names[li] if class_names else str(li)
        if scores is not None:
            txt += f" {float(scores[i]):.2f}"
        if txt:
            d.text((float(box[0]) + 2, float(box[1]) + 2), txt, fill=color)
    if points is not None:
        for i, pt in enumerate(np.asarray(points)):
            color = _COLORS[i % len(_COLORS)]
            x, y = float(pt[0]), float(pt[1])
            d.ellipse([x - 3, y - 3, x + 3, y + 3], fill=color)
    return np.asarray(pil)


def dump_pseudo_labels(
    out_dir: str,
    name: str,
    img: np.ndarray,
    aux: dict,
    class_names=None,
) -> list[str]:
    """Write the train-step ``aux`` dict (pseudo boxes/masks/centers/fg
    maps) as pngs — the `vis_imags/` dump analog. ``img`` is the
    normalised (H, W, 3) input; ``aux`` the detector's aux output for one
    image (leading batch dim already indexed away)."""
    os.makedirs(out_dir, exist_ok=True)
    base = denormalize(np.asarray(img))
    valid = np.asarray(aux["pseudo_valid"], bool)
    paths = []

    boxes = np.asarray(aux["pseudo_boxes"])[valid]
    centers = np.asarray(aux["semantic_centers"])[valid]
    cvalid = np.asarray(aux["semantic_valid"])[valid]
    masks = np.asarray(aux["pseudo_masks"])[valid].astype(bool)
    vis = draw_detections(
        base, boxes, masks=masks,
        points=centers[cvalid] if cvalid.any() else None,
        class_names=class_names,
    )
    p = os.path.join(out_dir, f"{name}_pseudo.png")
    Image.fromarray(vis).save(p)
    paths.append(p)

    fg = np.asarray(aux["map_fg"])[valid]
    if len(fg):
        p = os.path.join(out_dir, f"{name}_fg.png")
        Image.fromarray(overlay_heatmap(base, fg.max(0))).save(p)
        paths.append(p)
    return paths
