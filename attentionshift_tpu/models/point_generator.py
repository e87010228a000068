"""Class-agnostic supervision-point generator (RepPoints auxiliary).

Rebuilds ``ClassAgnosticSupervisionPointGenerator``
(`mmdet/models/dense_heads/deform_pseudo_point_generator.py:19-145`):
part anchors sample a dense contour-offset field
(`get_pred_by_sample:25-47`), each part's predicted contour is
rasterised as a filled convex hull (`contour_to_mask:85-90`, cv2
``convexHull`` + ``fillConvexPoly`` upstream), per-object hull sums
normalised and thresholded into core regions (`get_core_region:92-114`),
and candidate parts are kept when their hull covers enough of their
object's core (`filter_with_region:49-83`).

TPU redesign: ragged per-image/per-object lists become a flat padded
part axis with an owner index; the cv2 hull is a fixed-iteration Jarvis
march + half-plane rasteriser (vmapped over parts), evaluated on a
strided grid (``raster_stride``; stride 1 reproduces full resolution).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.sampling import point_sample

__all__ = ["SupervisionPointGenerator", "convex_hull_mask", "SupervisionPoints"]


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def convex_hull_mask(pts: jnp.ndarray, grid_hw: tuple[int, int],
                     stride: float = 1.0) -> jnp.ndarray:
    """Rasterise the filled convex hull of K points on an (H, W) grid.

    Jarvis march with K fixed steps (the hull of K points has <= K
    vertices; after closing, the walk re-emits the start vertex and the
    zero-length edges are neutral in the half-plane test). Degenerate
    (collinear) hulls fall back to the point bounding box intersected
    with the collinear band.

    Args:
        pts: (K, 2) xy in image coordinates.
        grid_hw: raster grid shape; pixel (r, c) samples image point
            ((c + 0.5) * stride, (r + 0.5) * stride).
    """
    k = pts.shape[0]
    h, w = grid_hw
    # scale-relative tolerance: cross products are O(extent^2) and f32
    # rounding is ~1e-7 relative, so a fixed 1e-6 would wedge the march
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    extent = jnp.maximum((hi - lo).max(), 1.0)
    eps = 1e-5 * extent * extent + 1e-6

    start = jnp.argmin(pts[:, 0] * 1e6 + pts[:, 1])

    def step(cur, _):
        c = pts[cur]
        cr = _cross(c[None, None], pts[:, None], pts[None, :])  # (q, p)
        ok = (cr <= eps).all(axis=1)  # all points clockwise of c->q
        d = jnp.linalg.norm(pts - c, axis=-1)
        score = jnp.where(ok, d, -1.0)
        nxt = jnp.argmax(score)
        nxt = jnp.where(score[nxt] <= 0.0, cur, nxt)  # duplicates/degenerate
        return nxt, nxt

    _, order = jax.lax.scan(step, start, None, length=k)
    verts = jnp.concatenate([pts[start][None], pts[order]], axis=0)  # (K+1, 2)

    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    px = jnp.broadcast_to(xs[None, :], (h, w))
    py = jnp.broadcast_to(ys[:, None], (h, w))
    p = jnp.stack([px, py], axis=-1)  # (H, W, 2)

    a = verts[:-1]  # (K, 2)
    b = verts[1:]
    cr = _cross(a[:, None, None, :], b[:, None, None, :], p[None])  # (K, H, W)
    inside = (cr <= eps).all(axis=0)
    inbox = (
        (p[..., 0] >= lo[0] - stride) & (p[..., 0] <= hi[0] + stride)
        & (p[..., 1] >= lo[1] - stride) & (p[..., 1] <= hi[1] + stride)
    )
    return inside & inbox


class SupervisionPoints(NamedTuple):
    scores: jnp.ndarray  # (P,) core-coverage score per part
    keep: jnp.ndarray  # (P,) bool
    core_regions: jnp.ndarray  # (O, Hs, Ws) bool
    pred_points: jnp.ndarray  # (P, K, 2) sampled contour points


class SupervisionPointGenerator:
    """Fixed-shape supervision-point filter over a part axis.

    Args:
        point_strides: stride of the offset field (reference: 16).
        mask_thr: core-region threshold on the normalised hull sum.
        point_thr: keep threshold on the core-coverage score.
        raster_stride: hull rasterisation stride in pixels.
    """

    def __init__(self, point_strides: int = 16, mask_thr: float = 0.75,
                 point_thr: float = 0.75, raster_stride: int = 4):
        self.point_strides = point_strides
        self.mask_thr = mask_thr
        self.point_thr = point_thr
        self.raster_stride = raster_stride

    def pred_points(self, anchors: jnp.ndarray, offsets: jnp.ndarray
                    ) -> jnp.ndarray:
        """Sample the offset field at each anchor (`get_pred_by_sample`).

        Args:
            anchors: (P, 2) xy image coords.
            offsets: (2K, Hf, Wf) per-location contour offsets.

        Returns:
            (P, K, 2) predicted contour points (anchor + offset*stride).
        """
        _, hf, wf = offsets.shape
        h, w = hf * self.point_strides, wf * self.point_strides
        norm = anchors / jnp.asarray([w, h], jnp.float32)
        samp = point_sample(offsets[None], norm[None])[0]  # (2K, P)
        off = samp.reshape(-1, 2, anchors.shape[0]).transpose(2, 0, 1)
        return off * self.point_strides + anchors[:, None, :]

    def __call__(self, ctr_offsets: jnp.ndarray, init_pts: jnp.ndarray,
                 part_obj: jnp.ndarray, part_valid: jnp.ndarray,
                 num_objects: int) -> SupervisionPoints:
        """Generate + filter supervision points (`gen_supervision_point`).

        Args:
            ctr_offsets: (2K, Hf, Wf) contour-offset field.
            init_pts: (P, 2) part anchors (semantic centres + gt points).
            part_obj: (P,) owning object slot.
            part_valid: (P,) bool.
            num_objects: O (static).
        """
        _, hf, wf = ctr_offsets.shape
        h = hf * self.point_strides
        w = wf * self.point_strides
        hs, ws = h // self.raster_stride, w // self.raster_stride

        pred = self.pred_points(init_pts, ctr_offsets)  # (P, K, 2)
        hulls = jax.vmap(
            lambda q: convex_hull_mask(q, (hs, ws), float(self.raster_stride))
        )(pred)  # (P, Hs, Ws)
        hulls = hulls & part_valid[:, None, None]

        owner = jax.nn.one_hot(part_obj, num_objects, axis=0)  # (O, P)
        owner = owner * part_valid[None, :]
        sums = jnp.einsum(
            "op,phw->ohw", owner, hulls.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        mx = jnp.maximum(sums.max(axis=(-2, -1), keepdims=True), 1e-6)
        core = (sums / mx) > self.mask_thr  # (O, Hs, Ws)

        core_per_part = core[part_obj]  # (P, Hs, Ws)
        denom = jnp.maximum(core_per_part.sum(axis=(-2, -1)), 1e-4)
        scores = (hulls & core_per_part).sum(axis=(-2, -1)) / denom
        keep = (scores > self.point_thr) & part_valid
        return SupervisionPoints(scores, keep, core, pred)
