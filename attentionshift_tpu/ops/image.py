"""Image resize ops with PyTorch-compatible sampling semantics.

The reference relies on ``F.interpolate`` in three places (bilinear CAM
upsampling, pos-embed bicubic interpolation, mask-head upsampling — e.g.
``stdroi_point_deform_attn_reppoints.py:2275``,
``models/vision_transformer.py:200-204``). PyTorch's
``align_corners=False`` uses half-pixel centres and its bicubic kernel uses
A=-0.75 (vs. jax.image's Catmull-Rom A=-0.5), so we build separable
interpolation weight matrices ourselves and apply them as matmuls — which
also happens to be the MXU-friendly formulation on TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_weight_matrix"]


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """PyTorch/OpenCV bicubic convolution kernel (A = -0.75)."""
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def _weight_matrix_np(
    in_size: int, out_size: int, method: str, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        src = dst * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (dst + 0.5) * scale - 0.5
    if method == "nearest":
        # torch 'nearest' (legacy): floor(dst * scale)
        idx = np.minimum((dst * (in_size / out_size)).astype(np.int64), in_size - 1)
        mat = np.zeros((out_size, in_size), dtype=np.float32)
        mat[np.arange(out_size), idx] = 1.0
        return mat
    if method in ("bilinear", "linear"):
        taps, radius = 2, 1.0

        def kern(x):
            return np.maximum(0.0, 1.0 - np.abs(x))

    elif method == "bicubic":
        taps, radius = 4, 2.0
        kern = _cubic_kernel
    else:
        raise ValueError(f"unknown resize method: {method}")

    base = np.floor(src).astype(np.int64)
    # tap offsets centred on the source position
    offsets = np.arange(-(taps // 2 - 1), taps // 2 + 1)  # e.g. [0,1] or [-1,0,1,2]
    idx = base[:, None] + offsets[None, :]
    w = kern(src[:, None] - idx)
    # clamp-to-edge (replicate border) like torch
    idx = np.clip(idx, 0, in_size - 1)
    # normalise (cubic rows may not sum to exactly 1 near borders after clamp)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(mat, (np.repeat(np.arange(out_size), taps), idx.reshape(-1)), w.reshape(-1))
    del radius
    return mat.astype(np.float32)


def resize_weight_matrix(
    in_size: int, out_size: int, method: str = "bilinear", align_corners: bool = False
) -> jnp.ndarray:
    """Interpolation matrix ``W`` with ``out = W @ in`` along one axis."""
    return jnp.asarray(_weight_matrix_np(in_size, out_size, method, align_corners))


def resize(
    img: jnp.ndarray,
    out_shape: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize the last two axes of ``img`` to ``out_shape``.

    Matches ``torch.nn.functional.interpolate(..., mode=method,
    align_corners=align_corners)`` to float tolerance. Leading axes are
    treated as batch. Runs as two matmuls so it tiles onto the MXU.
    """
    h_in, w_in = img.shape[-2], img.shape[-1]
    h_out, w_out = out_shape
    if (h_in, w_in) == (h_out, w_out):
        return img
    dtype = img.dtype
    x = img.astype(jnp.float32)
    wh = resize_weight_matrix(h_in, h_out, method, align_corners)
    ww = resize_weight_matrix(w_in, w_out, method, align_corners)
    lead = x.shape[:-2]
    x = x.reshape((-1, h_in, w_in))
    # (B,h_out,w_in) <- (h_out,h_in) @ (B,h_in,w_in)
    x = jnp.einsum("oh,bhw->bow", wh, x, preferred_element_type=jnp.float32)
    x = jnp.einsum("bow,pw->bop", x, ww, preferred_element_type=jnp.float32)
    return x.reshape(lead + (h_out, w_out)).astype(dtype)
