"""MAE masked-reconstruction auxiliary head.

Rebuild of ``MAEDecoderHead`` (`mmdet/models/roi_heads/mae_head.py:22`,
201 LoC — the optional ``mae_head`` capability of the RoI head,
`stdroi_point_deform_attn_reppoints.py:2731-2733`): re-mask the already
computed encoder tokens (ratio 0.75), decode the full sequence with a
4-block ViT decoder + learned mask token + fixed sin-cos pos embed, and
regress per-patch pixels with the MAE normalised-pixel MSE on masked
patches only.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD
from .heads import _decoder_pos_embed
from .layers import Block

__all__ = ["MAEDecoderHead", "patchify"]


def patchify(imgs: jnp.ndarray, p: int = 16) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, (H/p)*(W/p), p*p*3) (MAE patch order)."""
    b, h, w, c = imgs.shape
    x = imgs.reshape(b, h // p, p, w // p, p, c)
    return jnp.einsum("bhpwqc->bhwpqc", x).reshape(b, (h // p) * (w // p), p * p * c)


class MAEDecoderHead(nn.Module):
    in_channels: int = 384
    embed_dim: int = 256
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    patch_size: int = 16
    base_grid: int = 14
    mask_ratio: float = 0.75
    norm_pix_loss: bool = True
    loss_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, img: jnp.ndarray, rng: jax.Array):
        """Args:
            tokens: (B, 1+N, Din) encoder output (cls + patch tokens).
            img: (B, H, W, 3) the NORMALISED input image (pipeline stats).
            rng: masking randomness.

        Returns scalar reconstruction loss.
        """
        b, n1, _ = tokens.shape
        n = n1 - 1
        h, w = img.shape[1:3]
        hp, wp = h // self.patch_size, w // self.patch_size
        len_keep = int(n * (1.0 - self.mask_ratio))

        noise = jax.random.uniform(rng, (b, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        mask = jnp.ones((b, n))
        mask = mask.at[:, :len_keep].set(0.0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)  # 1 = masked

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        vis = jnp.take_along_axis(
            x[:, 1:], ids_keep[..., None], axis=1
        )  # (B, keep, D)
        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        mt = jnp.broadcast_to(mask_token, (b, n - len_keep, self.embed_dim)).astype(x.dtype)
        x_ = jnp.concatenate([vis, mt], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)  # unshuffle
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        x = x + _decoder_pos_embed(self.embed_dim, self.base_grid, hp, wp).astype(x.dtype)
        for i in range(self.depth):
            x, _ = Block(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name=f"decoder_blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_norm")(x)
        pred = nn.Dense(
            self.patch_size**2 * 3, dtype=self.dtype, name="decoder_pred"
        )(x[:, 1:])  # (B, N, p*p*3)

        # target: un-normalise to [0, 1] then per-patch normalisation
        raw = img * (IMAGENET_STD / 255.0) + (IMAGENET_MEAN / 255.0)
        target = patchify(raw, self.patch_size)
        if self.norm_pix_loss:
            mu = target.mean(-1, keepdims=True)
            var = target.var(-1, keepdims=True)
            target = (target - mu) / jnp.sqrt(var + 1e-6)
        loss = ((pred.astype(jnp.float32) - target) ** 2).mean(-1)  # (B, N)
        loss = (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return self.loss_weight * loss
