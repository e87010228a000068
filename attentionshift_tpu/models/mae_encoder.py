"""MAE-pretrain-style plain-ViT detection backbone.

Rebuild of ``MAEVisionTransformer`` / ``PretrainVisionTransformerEncoder``
(`mmdet/models/backbones/mae_encoder.py:200-453`): a cls-token-free ViT
over stride-16 patches with the classic 1-D sinusoid position table
(`get_sinusoid_encoding_table`, `mae_encoder.py:187-198`), optional
LayerScale (``init_values``, `mae_encoder.py:136-158`), optional
window/global "split attention" (every block attends inside
``window x window`` tiles except each ``split_attn_freq``-th block,
`mae_encoder.py:282-302`), taps at ``out_indices`` and the standard
4-level deconv/identity/maxpool pyramid (`mae_encoder.py:246-268`).

TPU notes: channel-last layout; windowed attention is a reshape to
window-batched sequences (static shapes — H/W must be divisible by the
window when split attention is on, same assert as the reference);
optional ``jax.checkpoint`` per block.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import Attention, Mlp, PatchEmbed

__all__ = ["MAEVisionTransformer", "get_sinusoid_encoding_table"]


def get_sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Classic transformer sinusoid table (`mae_encoder.py:187-198`)."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (i // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class _MAEBlock(nn.Module):
    """Pre-norm block with optional LayerScale and windowed attention."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grid_hw=None, window: int = 0):
        dim = x.shape[-1]

        def scale(name, y):
            if self.init_values <= 0.0:
                return y
            gamma = self.param(
                name, lambda *_: jnp.full((dim,), self.init_values, jnp.float32)
            )
            return y * gamma.astype(y.dtype)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn = Attention(self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")
        if window > 0:
            hp, wp = grid_hw
            b, n, d = h.shape
            nh, nw = hp // window, wp // window
            hw = h.reshape(b, nh, window, nw, window, d).transpose(0, 1, 3, 2, 4, 5)
            hw = hw.reshape(b * nh * nw, window * window, d)
            yw, _ = attn(hw, False)
            yw = yw.reshape(b, nh, nw, window, window, d).transpose(0, 1, 3, 2, 4, 5)
            y = yw.reshape(b, n, d)
        else:
            y, _ = attn(h, False)
        x = x + scale("gamma_1", y)
        z = Mlp(int(dim * self.mlp_ratio), dim, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        )
        return x + scale("gamma_2", z)


class MAEVisionTransformer(nn.Module):
    """Sinusoid-pos-embed ViT backbone with 4-level pyramid outputs.

    Returns a tuple of 4 channel-last feature maps at strides
    (4, 8, 16, 32) when ``with_fpn`` (the reference's fpn1..fpn4), else
    the raw stride-16 taps.
    """

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: float = 0.0
    out_indices: Sequence[int] = (3, 5, 7, 11)
    with_fpn: bool = True
    split_attn_freq: int = 0  # 0 = always global attention
    window: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img):
        b, h, w, _ = img.shape
        hp, wp = h // self.patch_size, w // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name="patch_embed")(img)
        x = x.reshape(b, hp * wp, self.embed_dim)
        pos = get_sinusoid_encoding_table(hp * wp, self.embed_dim)
        x = x + jnp.asarray(pos, self.dtype)[None]

        taps = []
        for i in range(self.depth):
            split = False
            if self.split_attn_freq > 0:
                split = (i + 1) % self.split_attn_freq != 0
                assert hp % self.window == 0 and wp % self.window == 0, (
                    "split attention needs grid divisible by window"
                )
                split = split and hp > self.window and wp > self.window
            x = _MAEBlock(
                self.num_heads, self.mlp_ratio, self.qkv_bias,
                self.init_values, dtype=self.dtype, name=f"blocks_{i}",
            )(x, (hp, wp), self.window if split else 0)
            if i in self.out_indices:
                xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"tapnorm_{len(taps)}")(x)
                taps.append(xn.reshape(b, hp, wp, self.embed_dim))

        if not self.with_fpn:
            return tuple(taps)
        d = self.embed_dim
        f1 = nn.ConvTranspose(d, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="fpn1_deconv1")(taps[0])
        f1 = nn.gelu(
            nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                         dtype=self.dtype, name="fpn1_bn")(f1),
            approximate=False,
        )
        f1 = nn.ConvTranspose(d, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="fpn1_deconv2")(f1)
        f2 = nn.ConvTranspose(d, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="fpn2_deconv")(taps[1])
        f3 = taps[2]
        f4 = nn.max_pool(taps[3], (2, 2), strides=(2, 2))
        return (f1, f2, f3, f4)
