"""RoIAlign with mmcv semantics, formulated as matmuls for the MXU.

Replaces ``mmcv.ops.RoIAlign`` (configs use ``output_size=7/14,
sampling_ratio=0, aligned=True`` on the stride-16 ViT feature,
`configs/mae/attnshift_voc12aug.py:64-68,123-127`).

Instead of per-sample gathers (slow on TPU), each RoI builds separable
row/column interpolation matrices ``Wy (Sy, H)``, ``Wx (Sx, W)`` from
one-hots, and the crop becomes ``Wy @ F @ Wx^T`` followed by an average
pool over the per-bin sample grid — everything dense, static-shaped, and
MXU-tileable.

The only deviation from mmcv: ``sampling_ratio=0`` (adaptive
ceil(bin_size) samples) is data-dependent and thus unjittable; we use a
fixed ``sampling_ratio`` (default 2, the common detectron2 choice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["roi_align"]


def _interp_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """(S,) continuous pixel coords -> (S, size) bilinear weight rows.

    mmcv bilinear_interpolate semantics: zero outside [-1, size]; clamp
    into [0, size-1] at the borders.
    """
    valid = (coords > -1.0) & (coords < size)
    c = jnp.clip(coords, 0.0, size - 1.0)
    lo = jnp.floor(c)
    frac = c - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, size - 1)
    w_lo = (1.0 - frac) * valid
    w_hi = frac * valid
    mat = (
        jax.nn.one_hot(lo_i, size, dtype=jnp.float32) * w_lo[:, None]
        + jax.nn.one_hot(hi_i, size, dtype=jnp.float32) * w_hi[:, None]
    )
    return mat


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned")
)
def roi_align(
    feats: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoIAlign.

    Args:
        feats: (B, C, H, W) feature maps.
        rois: (N, 5) [batch_idx, x1, y1, x2, y2] in image coordinates.
        spatial_scale: feature stride inverse (e.g. 1/16).
        output_size: output bin grid (out x out).
        sampling_ratio: samples per bin per axis (static).
        aligned: half-pixel alignment (mmcv aligned=True).

    Returns:
        (N, C, output_size, output_size).
    """
    b, c, h, w = feats.shape
    n = rois.shape[0]
    out = output_size
    sr = sampling_ratio
    offset = 0.5 if aligned else 0.0

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # sample positions: (out*sr,) per axis, separable over bins and samples
    bin_ids = jnp.arange(out, dtype=jnp.float32)
    samp_ids = jnp.arange(sr, dtype=jnp.float32)
    # position within roi, units of bins: bin + (s + .5)/sr
    rel = bin_ids[:, None] + (samp_ids[None, :] + 0.5) / sr  # (out, sr)
    rel = rel.reshape(-1)  # (out*sr,)

    ys = y1[:, None] + rel[None, :] * bin_h[:, None]  # (N, out*sr)
    xs = x1[:, None] + rel[None, :] * bin_w[:, None]

    wy = jax.vmap(lambda cds: _interp_matrix(cds, h))(ys)  # (N, S, H)
    wx = jax.vmap(lambda cds: _interp_matrix(cds, w))(xs)  # (N, S, W)

    if b == 1:
        # single-image batch (the reference's per-chip training batch):
        # contracting against the shared feature map keeps everything
        # dense. The general path's ``feats[batch_idx]`` gather
        # materialises an (N, C, H, W) per-roi copy (1.65 GB at the
        # train shape) and its transpose becomes a scatter-add in the
        # backward — the round-4 train-step trace put that line at
        # ~30 ms/step. One THREE-operand einsum (round 5) lets XLA pick
        # the association and the intermediate layout jointly: the
        # hand-staged two-step form forced an (N, C, S, W) intermediate
        # whose layout mismatched the second dot (a 925 MB relayout
        # copy, ~1.4 ms/step); fwd+bwd measured 2.70 -> 2.12 ms at the
        # 512-roi 7x7 bench shape, 0.38 -> 0.20 ms at the mask head's
        # 128-roi 14x14. Weights ride in the feature dtype; both
        # contractions accumulate in f32.
        crops = jnp.einsum(
            "nsh,chw,ntw->ncst",
            wy.astype(feats.dtype), feats[0], wx.astype(feats.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        per_roi_feats = feats[batch_idx]  # (N, C, H, W)
        # (N, C, S, W) <- (N, S, H) x (N, C, H, W)
        tmp = jnp.einsum(
            "nsh,nchw->ncsw", wy, per_roi_feats,
            preferred_element_type=jnp.float32,
        )
        # the (N, C, S, W) intermediate is the dominant HBM cost of the
        # separable form; store it in the feature dtype (bf16 on TPU) —
        # the second contraction accumulates in f32
        tmp = tmp.astype(feats.dtype)
        crops = jnp.einsum(
            "ncsw,ntw->ncst", tmp, wx, preferred_element_type=jnp.float32
        )
    # average pool the sr x sr samples inside each bin
    crops = crops.reshape(n, c, out, sr, out, sr).mean(axis=(3, 5))
    return crops.astype(feats.dtype)
