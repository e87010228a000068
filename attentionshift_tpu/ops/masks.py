"""Mask-map utilities: box rasterisation, morphology, mask pasting.

TPU-native equivalents of the reference's helpers
(`stdroi_point_deform_attn_reppoints.py`): ``box2mask`` (:303),
``corrosion``/``corrosion_batch`` min-pool erosion (:145-146, :1182-1187),
``expension`` max-pool dilation (:1189), and the detectron2-style
``_do_paste_mask`` RoI->image paste (`mae_mask_head_pointSup.py:411-479`)
rewritten as a fixed-shape bilinear gather (no dynamic crop windows, so it
stays jit-compatible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["box2mask", "corrosion", "expansion", "paste_masks"]


def box2mask(bboxes: jnp.ndarray, img_size: tuple[int, int], default_val: float = 0.5) -> jnp.ndarray:
    """Rasterise xyxy boxes into (N, H, W) maps.

    Inside-box pixels get 1.0, outside ``default_val``. Matches the
    reference's integer-crop semantics ``mask[int(y1):int(y2+1),
    int(x1):int(x2+1)] = 1`` via half-open comparisons on pixel indices.
    """
    h, w = img_size
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1 = jnp.floor(bboxes[:, 0])[:, None, None]
    y1 = jnp.floor(bboxes[:, 1])[:, None, None]
    x2 = jnp.floor(bboxes[:, 2])[:, None, None]
    y2 = jnp.floor(bboxes[:, 3])[:, None, None]
    inside = (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)
    return jnp.where(inside, 1.0, jnp.float32(default_val))


def _separable_pool(cam: jnp.ndarray, k: int, init, op) -> jnp.ndarray:
    """Rectangular sliding-window reduction as two 1-D passes.

    min/max over a k x k window == min/max over rows then columns: k^2
    window reads become 2k — at the engine's 21x21 erosion on full-res
    maps this is ~10x less VPU work than the 2-D ``reduce_window``.
    """
    pad = k // 2
    lead = cam.shape[:-2]
    x = cam.reshape((-1,) + cam.shape[-2:])
    x = jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1, k, 1), window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (0, 0)),
    )
    x = jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1, 1, k), window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (pad, pad)),
    )
    return x.reshape(lead + cam.shape[-2:])


def corrosion(cam: jnp.ndarray, corr_size: int = 11) -> jnp.ndarray:
    """Min-pool erosion with SAME padding over the last two axes.

    Equivalent to ``-F.max_pool2d(-cam, k, 1, k//2)``: out-of-bounds
    window positions are ignored (+inf padding under min).
    """
    return _separable_pool(
        cam, corr_size, jnp.asarray(jnp.inf, cam.dtype), jax.lax.min
    )


def expansion(cam: jnp.ndarray, expn_size: int = 5) -> jnp.ndarray:
    """Max-pool dilation with SAME padding over the last two axes."""
    return _separable_pool(
        cam, expn_size, jnp.asarray(-jnp.inf, cam.dtype), jax.lax.max
    )


def paste_masks(
    masks: jnp.ndarray,
    boxes: jnp.ndarray,
    img_h: int,
    img_w: int,
) -> jnp.ndarray:
    """Paste (N, h, w) RoI mask probabilities into (N, img_h, img_w).

    Bilinear grid-sample with ``align_corners=False`` and zero padding,
    matching `_do_paste_mask` (`mae_mask_head_pointSup.py:411-479`) without
    the chunking/skip-empty host logic (shapes are static under jit).
    """
    n, mh, mw = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :4], 4, axis=1)  # (N,1) each

    img_y = jnp.arange(img_h, dtype=jnp.float32)[None, :] + 0.5
    img_x = jnp.arange(img_w, dtype=jnp.float32)[None, :] + 0.5
    # normalised [-1, 1] coords wrt each box
    gy = (img_y - y1) / jnp.maximum(y2 - y1, 1e-6) * 2.0 - 1.0  # (N, H)
    gx = (img_x - x1) / jnp.maximum(x2 - x1, 1e-6) * 2.0 - 1.0  # (N, W)

    # convert to source pixel coords (align_corners=False)
    sy = ((gy + 1.0) * mh - 1.0) / 2.0
    sx = ((gx + 1.0) * mw - 1.0) / 2.0

    def sample_1d(size):
        def weights(coord):
            i0 = jnp.floor(coord)
            frac = coord - i0
            i0 = i0.astype(jnp.int32)
            i1 = i0 + 1
            v0 = (i0 >= 0) & (i0 < size)
            v1 = (i1 >= 0) & (i1 < size)
            return (
                jnp.clip(i0, 0, size - 1),
                jnp.clip(i1, 0, size - 1),
                jnp.where(v0, 1.0 - frac, 0.0),
                jnp.where(v1, frac, 0.0),
            )

        return weights

    y0, y1i, wy0, wy1 = sample_1d(mh)(sy)  # (N, H)
    x0, x1i, wx0, wx1 = sample_1d(mw)(sx)  # (N, W)

    def paste_one(m, y0_, y1_, wy0_, wy1_, x0_, x1_, wx0_, wx1_):
        rows0 = m[y0_, :]  # (H, w)
        rows1 = m[y1_, :]
        rowmix = rows0 * wy0_[:, None] + rows1 * wy1_[:, None]  # (H, w)
        cols0 = rowmix[:, x0_]  # (H, W)
        cols1 = rowmix[:, x1_]
        return cols0 * wx0_[None, :] + cols1 * wx1_[None, :]

    return jax.vmap(paste_one)(masks, y0, y1i, wy0, wy1, x0, x1i, wx0, wx1)
