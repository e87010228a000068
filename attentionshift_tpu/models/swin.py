"""Swin Transformer backbone (windowed attention), channel-last TPU-native.

Rebuild of the reference's detection Swin
(`mmdet/models/backbones/swin_transformer.py`, 630 LoC; raw variant
`models/swin_transformer.py`): patch embed -> 4 stages of shifted-window
attention blocks with relative position bias and patch merging, emitting
a 4-level pyramid. The BASELINE "Swin windowed-attention attention-shift"
variant has NO shipped reference config (SURVEY.md section 2.2), so this
module adds the attnshift hook as a design choice: ``attnshift=True``
appends ``global_blocks`` full-attention blocks with point tokens on the
stride-32 map (the ViT engine's contract — attention capture + point
class/coord heads) so the pseudo-label engine runs unchanged on Swin
features.

Window partition/reverse are pure reshapes (layout-friendly on TPU); the
shifted-window mask is built statically per (H, W, shift).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Block, Mlp
from .vit import MlpHead

__all__ = ["SwinTransformer"]


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]  # (N, N)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (-100 across region boundaries).

    Pure numpy end to end: routing the region map through jnp (the old
    ``window_partition(jnp.asarray(...))`` round-trip) breaks under an
    enclosing ``jax.jit`` once the map exceeds the constant-lifting
    threshold — large closure constants become tracers, and the
    ``np.asarray`` back-conversion raises TracerArrayConversionError
    (surfaced by the first real-TPU Swin compile at 256x256; the unit
    tests' 64x64 maps stayed below the threshold).
    """
    img_mask = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wss] = cnt
            cnt += 1
    # numpy window partition: (H, W) -> (nW, ws*ws)
    mw = (
        img_mask.reshape(h // ws, ws, w // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, capture: bool = False):
        """x: (B_, N, C) windows; mask: (nW, N, N) or None."""
        b_, n, c = x.shape
        ws = self.window_size
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)  # (H, N, N)

        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        ) + bias[None].astype(jnp.float32)
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(b_ // nw, nw, self.num_heads, n, n)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(b_, self.num_heads, n, n)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if capture:
            return out, jax.lax.stop_gradient(probs.mean(axis=1))
        return out, None


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, capture: bool = False):
        """x: (B, H, W, C); H, W divisible by window_size."""
        b, h, w, c = x.shape
        # clamp window to the feature size (reference behaviour for the
        # coarsest stages); no shifting when a single window covers all
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(h, w, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws)
        wins, attn = WindowAttention(
            self.num_heads, ws, dtype=self.dtype, name="attn"
        )(wins, mask, capture)
        y = window_reverse(wins, ws, h, w)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp")(z)
        return x, attn


class PatchMerging(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """4-stage Swin; returns a pyramid of per-stage (normed) features.

    With ``attnshift=True``, additionally runs ``global_blocks``
    full-attention Blocks (+ ``point_tokens`` learnable tokens) on the
    stride-32 stage and returns the ViT-engine output contract
    (attns / point_tokens / outputs_class / outputs_coord / last_feat).
    """

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # attnshift hook
    attnshift: bool = False
    point_tokens: int = 100
    num_classes: int = 20
    global_blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, deterministic: bool = True):
        b, h, w, _ = img.shape
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(img)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        feats = []
        for st, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for i in range(depth):
                shift = 0 if i % 2 == 0 else self.window_size // 2
                x, _ = SwinBlock(
                    heads, self.window_size, shift, self.mlp_ratio,
                    dtype=self.dtype, name=f"stage{st}_block{i}",
                )(x)
            if st in self.out_indices:
                feats.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{st}")(x)
                )
            if st < len(self.depths) - 1:
                x = PatchMerging(dtype=self.dtype, name=f"merge{st}")(x)

        ret = dict(feature=tuple(feats))
        if not self.attnshift:
            return ret

        # ---- attnshift hook: global attention + point tokens at stride 32
        bb, hh, ww, cc = feats[-1].shape
        tokens = feats[-1].reshape(bb, hh * ww, cc)
        pt = self.param(
            "point_token", nn.initializers.truncated_normal(0.02),
            (1, self.point_tokens, cc),
        )
        ppe = self.param(
            "point_pos_embed", nn.initializers.truncated_normal(0.02),
            (1, self.point_tokens, cc),
        )
        tokens = jnp.concatenate(
            [tokens, jnp.broadcast_to(pt + ppe, (bb, self.point_tokens, cc)).astype(tokens.dtype)],
            axis=1,
        )
        attns = []
        for i in range(self.global_blocks):
            tokens, attn = Block(
                num_heads=max(self.num_heads[-1], 1), mlp_ratio=self.mlp_ratio,
                capture=True, dtype=self.dtype, name=f"global_block{i}",
            )(tokens)
            attns.append(attn)
        last = tokens[:, : hh * ww]
        pts = tokens[:, hh * ww :]
        ret.update(
            # prepend a zero "cls" column so the (cls | patches | points)
            # layout matches the ViT engine contract
            attns=jnp.pad(jnp.stack(attns, 0), ((0, 0), (0, 0), (1, 0), (1, 0))),
            last_feat=jnp.concatenate(
                [jnp.zeros((bb, 1, cc), last.dtype), last], axis=1
            ),
            point_tokens=pts,
            outputs_class=MlpHead(cc, self.num_classes, dtype=self.dtype, name="class_embed")(pts),
            outputs_coord=jax.nn.sigmoid(
                MlpHead(cc, 2, dtype=self.dtype, name="bbox_embed")(pts)
            ),
        )
        return ret
