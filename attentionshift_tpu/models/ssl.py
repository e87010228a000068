"""Self-supervised projection heads + masked-image-modeling ViT forward.

Rebuilds the DINO/iBOT leftovers the reference carries for its
MAE/iBOT-pretrained backbones:

- ``DINOHead`` (`models/head.py:65-143`): MLP (hidden -> bottleneck),
  L2-normalise, weight-normed prototype layer (``weight_g`` frozen at 1
  when ``norm_last_layer`` — here the direction matrix is simply
  row-normalised at use, the exact equivalent of a frozen unit gain).
- ``iBOTHead`` (`models/head.py:146-199`): same trunk; token 0 goes
  through the cls prototype layer, patch tokens through a second (or
  shared) patch prototype layer.
- ``MIMViT`` (`mmdet/models/backbones/ibot_vit.py:37-170` capability):
  plain ViT forward where a boolean patch mask swaps masked patch
  embeddings for a learnable mask token before the blocks — the iBOT /
  MAE-style masked-image-modeling entry point.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Block, PatchEmbed, interpolate_pos_embed

__all__ = ["DINOHead", "IBOTHead", "MIMViT"]


class _Prototypes(nn.Module):
    """Weight-normed linear (no bias): x @ normalize(V)^T * g.

    torch ``weight_norm`` keeps direction ``weight_v`` and gain
    ``weight_g``; DINO freezes g=1, so the op is a matmul with
    unit-normalised rows.
    """

    out_dim: int
    learnable_gain: bool = False

    @nn.compact
    def __call__(self, x):
        v = self.param(
            "weight_v",
            nn.initializers.truncated_normal(0.02),
            (self.out_dim, x.shape[-1]),
        )
        vn = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        if self.learnable_gain:
            g = self.param("weight_g", nn.initializers.ones, (self.out_dim,))
            vn = vn * g[:, None]
        return x @ vn.T


class DINOHead(nn.Module):
    out_dim: int
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    norm_last_layer: bool = True  # frozen unit gain on the prototypes

    @nn.compact
    def __call__(self, x):
        n = max(self.nlayers, 1)
        if n == 1:
            x = nn.Dense(self.bottleneck_dim, name="mlp")(x)
        else:
            x = nn.gelu(nn.Dense(self.hidden_dim, name="mlp_0")(x), approximate=False)
            for i in range(n - 2):
                x = nn.gelu(
                    nn.Dense(self.hidden_dim, name=f"mlp_{i + 1}")(x),
                    approximate=False,
                )
            x = nn.Dense(self.bottleneck_dim, name=f"mlp_{n - 1}")(x)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return _Prototypes(
            self.out_dim, learnable_gain=not self.norm_last_layer,
            name="last_layer",
        )(x)


class IBOTHead(nn.Module):
    """DINO trunk + separate/shared patch prototype layer.

    Call with (B, 1+N, D) tokens -> (cls_logits (B, out_dim),
    patch_logits (B, N, patch_out_dim)); with (B, D) -> cls path only.
    """

    out_dim: int
    patch_out_dim: int = 8192
    nlayers: int = 3
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    norm_last_layer: bool = True
    shared_head: bool = False

    @nn.compact
    def __call__(self, x):
        n = max(self.nlayers, 1)

        def trunk(y):
            if n == 1:
                return nn.Dense(self.bottleneck_dim, name="mlp")(y)
            y = nn.gelu(nn.Dense(self.hidden_dim, name="mlp_0")(y), approximate=False)
            for i in range(n - 2):
                y = nn.gelu(
                    nn.Dense(self.hidden_dim, name=f"mlp_{i + 1}")(y),
                    approximate=False,
                )
            return nn.Dense(self.bottleneck_dim, name=f"mlp_{n - 1}")(y)

        cls_layer = _Prototypes(
            self.out_dim, learnable_gain=not self.norm_last_layer,
            name="last_layer",
        )
        z = trunk(x)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        if x.ndim == 2:
            return cls_layer(z)
        patch_layer = (
            cls_layer
            if self.shared_head
            else _Prototypes(
                self.patch_out_dim, learnable_gain=not self.norm_last_layer,
                name="last_layer2",
            )
        )
        return cls_layer(z[:, 0]), patch_layer(z[:, 1:])


class MIMViT(nn.Module):
    """ViT forward with masked-patch substitution (iBOT/MAE-style MIM).

    Args (call): img (B, H, W, 3); mask (B, Hp*Wp) bool, True = replace
    the patch embedding with the learnable mask token.

    Returns (B, 1+N, D) final tokens (cls + patches, LayerNorm'ed).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_size: int = 16
    img_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, mask=None):
        b, h, w, _ = img.shape
        hp, wp = h // self.patch_size, w // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(img)
        x = x.reshape(b, hp * wp, self.embed_dim)
        if mask is not None:
            mask_token = self.param(
                "mask_token", nn.initializers.truncated_normal(0.02),
                (1, 1, self.embed_dim),
            )
            x = jnp.where(mask[..., None], mask_token.astype(x.dtype), x)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        grid0 = self.img_size // self.patch_size
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, 1 + grid0 * grid0, self.embed_dim),
        )
        x = x + interpolate_pos_embed(pos, hp, wp).astype(x.dtype)
        for i in range(self.depth):
            x, _ = Block(self.num_heads, self.mlp_ratio, self.qkv_bias,
                         dtype=self.dtype, name=f"blocks_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
