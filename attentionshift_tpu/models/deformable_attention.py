"""Deformable conv-attention (support module for the part-refinement head).

Rebuild of ``DeformableConvAttention`` (`mmdet/models/utils/
deformable_attention.py:25-…`, shipped as support code for the missing
reppoints head): per query location, a depthwise conv tower predicts
``k*k`` sampling offsets; keys/values are bilinearly sampled at the
offset positions and attended with scaled dot-product per head.

TPU formulation: offset sampling is one ``grid_sample`` batch per kernel
tap (K taps x N queries gathers become K dense bilinear samples), the
attention itself is a (N, K) softmax — no data-dependent shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.sampling import grid_sample_bilinear

__all__ = ["DeformableConvAttention"]


class DeformableConvAttention(nn.Module):
    n_heads: int = 4
    kernel_size: int = 3
    offset_range_factor: float = 2.0
    tau: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, C) -> (B, H, W, C)."""
        b, h, w, c = x.shape
        k2 = self.kernel_size**2
        head_dim = c // self.n_heads

        # offset tower (depthwise convs + LN + gelu, as in the reference)
        o = x
        for i in range(2):
            o = nn.Conv(
                c, (self.kernel_size, self.kernel_size), padding="SAME",
                feature_group_count=c, dtype=self.dtype, name=f"off_conv{i}",
            )(o)
            o = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"off_ln{i}")(o)
            o = nn.gelu(o, approximate=False)
        offsets = nn.Conv(
            2 * k2, (1, 1), use_bias=False, dtype=self.dtype, name="off_out"
        )(o)  # (B, H, W, 2*k2)
        offsets = jnp.tanh(offsets) * self.offset_range_factor
        offsets = offsets.reshape(b, h, w, k2, 2)

        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_q")(x)
        kf = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_k")(x)
        vf = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_v")(x)

        # base kernel grid around each query location
        ks = self.kernel_size
        base = jnp.stack(
            jnp.meshgrid(
                jnp.arange(ks, dtype=jnp.float32) - ks // 2,
                jnp.arange(ks, dtype=jnp.float32) - ks // 2,
                indexing="ij",
            ),
            axis=-1,
        ).reshape(k2, 2)[..., ::-1]  # (k2, 2) xy
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        centers = jnp.stack([xs, ys], axis=-1)  # (H, W, 2) xy
        pos = centers[None, :, :, None, :] + base[None, None, None] + offsets
        # normalise to [-1, 1]
        grid = jnp.stack(
            [pos[..., 0] / jnp.maximum(w - 1, 1) * 2 - 1,
             pos[..., 1] / jnp.maximum(h - 1, 1) * 2 - 1],
            axis=-1,
        )  # (B, H, W, k2, 2)

        def sample_one(feat, g):
            # feat: (H, W, C) -> (C, H, W); g: (H, W, k2, 2)
            out = grid_sample_bilinear(feat.transpose(2, 0, 1), g, align_corners=True)
            return out  # (C, H, W, k2)

        ks_ = jax.vmap(sample_one)(kf, grid)  # (B, C, H, W, k2)
        vs_ = jax.vmap(sample_one)(vf, grid)

        qh = q.reshape(b, h, w, self.n_heads, head_dim)
        kh = ks_.reshape(b, self.n_heads, head_dim, h, w, k2)
        vh = vs_.reshape(b, self.n_heads, head_dim, h, w, k2)
        logits = jnp.einsum(
            "bhwnd,bndhwk->bhwnk", qh, kh, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5) / self.tau
        attn = jax.nn.softmax(logits, axis=-1)  # (B, H, W, heads, k2)
        out = jnp.einsum(
            "bhwnk,bndhwk->bhwnd", attn.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out.astype(x.dtype))
