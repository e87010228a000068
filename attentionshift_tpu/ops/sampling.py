"""Bilinear sampling ops: grid_sample-style point sampling.

Replaces ``mmcv.ops.point_sample`` (used to read mask logits at sampled
supervision points, `stdroi_point_deform_attn_reppoints.py:18,3153`) and
the grid-sample building block of mask pasting. Semantics follow
``F.grid_sample(align_corners=False, padding_mode='zeros')``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_bilinear", "point_sample"]


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """[-1, 1] grid coordinate -> continuous pixel index."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_bilinear(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample ``img`` (C, H, W) at ``grid`` (..., 2) of [-1,1] xy coords.

    Returns (C, ...) samples with zero padding outside the image,
    matching torch ``grid_sample(padding_mode='zeros')``.
    """
    c, h, w = img.shape
    gshape = grid.shape[:-1]
    pts = grid.reshape(-1, 2)
    x = _unnormalize(pts[:, 0], w, align_corners)
    y = _unnormalize(pts[:, 1], h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[:, yc, xc]  # (C, P)
        return vals * (wgt * valid)[None, :]

    out = (
        corner(y0i, x0i, (1 - dy) * (1 - dx))
        + corner(y0i, x0i + 1, (1 - dy) * dx)
        + corner(y0i + 1, x0i, dy * (1 - dx))
        + corner(y0i + 1, x0i + 1, dy * dx)
    )
    return out.reshape((c,) + gshape)


def point_sample(
    feats: jnp.ndarray,
    points: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """mmcv-compatible point_sample.

    Args:
        feats: (N, C, H, W) feature maps.
        points: (N, P, 2) xy coords normalised to [0, 1].

    Returns:
        (N, C, P) bilinear samples.
    """
    grid = points * 2.0 - 1.0
    return jax.vmap(lambda f, g: grid_sample_bilinear(f, g, align_corners))(feats, grid)
