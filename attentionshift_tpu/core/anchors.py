"""Anchor generation (mmdet v2 ``AnchorGenerator`` semantics).

Rebuilds the RPN anchor machinery the reference configures at
`configs/mae/attnshift_voc12aug.py:45-49` (scales [8], ratios
[0.5, 1, 2], strides [4, 8, 16, 32, 64]). Anchors are generated on host
(numpy) at static featmap shapes and fed to the jitted step as
constants — identical to the reference's per-level cached grids.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "base_anchors",
    "grid_anchors",
    "grid_anchors_per_level",
    "anchor_valid_flags",
]


def base_anchors(
    stride: int,
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (8.0,),
    center_offset: float = 0.0,
) -> np.ndarray:
    """(A, 4) base anchors for one level (mmdet gen_base_anchors)."""
    w = h = float(stride)
    x_center = center_offset * w
    y_center = center_offset * h
    h_ratios = np.sqrt(np.asarray(ratios, np.float64))
    w_ratios = 1.0 / h_ratios
    ws = (w * w_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    hs = (h * h_ratios[:, None] * np.asarray(scales)[None, :]).reshape(-1)
    return np.stack(
        [
            x_center - 0.5 * ws,
            y_center - 0.5 * hs,
            x_center + 0.5 * ws,
            y_center + 0.5 * hs,
        ],
        axis=-1,
    ).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _grid_anchors_cached(feat_hw, strides, ratios, scales) -> np.ndarray:
    out = []
    for (fh, fw), stride in zip(feat_hw, strides):
        base = base_anchors(stride, ratios, scales)  # (A, 4)
        sx = np.arange(fw, dtype=np.float32) * stride
        sy = np.arange(fh, dtype=np.float32) * stride
        shift_x, shift_y = np.meshgrid(sx, sy)
        shifts = np.stack(
            [shift_x.ravel(), shift_y.ravel(), shift_x.ravel(), shift_y.ravel()],
            axis=-1,
        )  # (fh*fw, 4)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        out.append(anchors)
    return np.concatenate(out, axis=0)


def grid_anchors(
    featmap_sizes: Sequence[tuple[int, int]],
    strides: Sequence[int] = (4, 8, 16, 32, 64),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (8.0,),
) -> jnp.ndarray:
    """All-level anchors concatenated: (sum_l fh*fw*A, 4) xyxy."""
    return jnp.asarray(
        _grid_anchors_cached(
            tuple(tuple(s) for s in featmap_sizes),
            tuple(strides),
            tuple(float(r) for r in ratios),
            tuple(float(s) for s in scales),
        )
    )


def grid_anchors_per_level(
    featmap_sizes: Sequence[tuple[int, int]],
    strides: Sequence[int] = (4, 8, 16, 32, 64),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    scales: Sequence[float] = (8.0,),
) -> list[jnp.ndarray]:
    """Per-level anchor lists (each (fh*fw*A, 4))."""
    return [
        grid_anchors([hw], [s], ratios, scales)
        for hw, s in zip(featmap_sizes, strides)
    ]


def anchor_valid_flags(
    anchors: jnp.ndarray, img_shape: tuple[int, int], allowed_border: int = -1
) -> jnp.ndarray:
    """(N,) bool; with allowed_border < 0 everything is valid (the
    reference trains with allowed_border=-1, `attnshift_voc12aug.py:159`)."""
    if allowed_border < 0:
        return jnp.ones((anchors.shape[0],), bool)
    h, w = img_shape
    return (
        (anchors[:, 0] >= -allowed_border)
        & (anchors[:, 1] >= -allowed_border)
        & (anchors[:, 2] < w + allowed_border)
        & (anchors[:, 3] < h + allowed_border)
    )
