"""Transformer building blocks (flax.linen) with attention capture.

Functional rebuild of the DINO/timm blocks the reference uses everywhere
(`models/vision_transformer.py:43-124`): Mlp, multi-head Attention that
can also return the head-averaged attention matrix (the raw material of
the attention-shift pseudo-label engine), pre-norm Block with optional
drop-path, and the fixed 2-D sin-cos position embedding used by the
decoder heads (`mmdet/models/utils/positional_encoding.py` analog).

The captured attention is ``stop_gradient``-ed: the reference only ever
consumes it inside no-grad pseudo-label math, so excluding it from the
backward pass is numerically equivalent and saves the N^2 backward
buffers.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Mlp", "Attention", "Block", "PatchEmbed", "Conv3x3Matmul", "Deconv2x2Matmul", "get_2d_sincos_pos_embed", "interpolate_pos_embed"]


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention; optionally emits mean-head attn probs.

    Mirrors `models/vision_transformer.py:62-86` (qkv fused projection,
    scale = head_dim**-0.5). With ``capture=True`` the softmax matrix is
    materialised, head-averaged, and returned detached.
    """

    num_heads: int
    qkv_bias: bool = True
    use_pallas: bool = False  # fused TPU kernel for capture blocks
    # [lo, hi) zero-token gap in the sequence to mask out of the softmax
    # (models/vit.py ``pad_tokens_to``); None = no padding present
    pad_interval: tuple | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, capture: bool = False):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, d)
        q = q.transpose(0, 2, 1, 3)  # (B, H, N, d)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        if self.use_pallas:
            # _sharded variants shard_map the kernel over the mesh's
            # ``model`` axis (heads) when a >1 TP mesh is active, so the
            # fused kernels compose with tensor parallelism; without a
            # mesh they are the plain fused kernels.
            from ..ops.attention import (
                attention_no_capture_sharded,
                attention_with_capture_sharded,
            )

            if capture:
                out, attn_mean = attention_with_capture_sharded(
                    q, k, v, True, self.pad_interval)
            else:
                out, attn_mean = attention_no_capture_sharded(
                    q, k, v, True, self.pad_interval), None
            out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)
            out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
            return out, attn_mean

        # bf16 models materialise the (N, N) logits in bf16 (the softmax
        # still runs its max/exp/sum chain through f32 converts fused
        # in-register): at the mask decoder's (128 rois, 8 heads, 196,
        # 196) shape the f32 logits tensor alone was 157 MB and its
        # softmax staging ~1 ms/block in the round-5 train-step trace.
        # f32 models keep exact f32 logits (CPU parity tests).
        pet = jnp.float32 if q.dtype == jnp.float32 else q.dtype
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=pet
        )
        if self.pad_interval is not None:
            lo, hi = self.pad_interval
            col = jnp.arange(n)
            logits = logits + jnp.where(
                (col >= lo) & (col < hi), -1e30, 0.0
            ).astype(logits.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(x.dtype)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if capture:
            attn_mean = jax.lax.stop_gradient(probs.mean(axis=1))  # (B, N, N)
            return out, attn_mean
        return out, None


class Block(nn.Module):
    """Pre-norm transformer block (`models/vision_transformer.py:88-124`).

    ``capture`` and ``deterministic`` are module fields (not call args) so
    the block can be wrapped in ``nn.remat`` without static-arg plumbing.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    capture: bool = False
    deterministic: bool = True
    use_pallas: bool = False
    pad_interval: tuple | None = None  # see Attention
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        y, attn = Attention(
            self.num_heads, self.qkv_bias, use_pallas=self.use_pallas,
            pad_interval=self.pad_interval, dtype=self.dtype, name="attn"
        )(nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x), self.capture)
        x = x + self._drop_path(y)
        z = Mlp(int(dim * self.mlp_ratio), dim, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        )
        x = x + self._drop_path(z)
        if self.capture:
            return x, attn
        return x, None

    def _drop_path(self, x):
        if self.drop_path == 0.0 or self.deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x / keep * mask


class _PatchProj(nn.Module):
    """Patch projection with a CONV-SHAPED kernel applied as a matmul.

    The parameter keeps nn.Conv's (p, p, C, D) kernel layout so MAE
    checkpoint conversion and existing param trees are unchanged, but
    the op is space-to-depth + one (N, p*p*C) x (p*p*C, D) matmul: a
    stride-p conv over C=3 input channels runs the MXU at ~1.5 TF/s
    (contraction dim 3) and forced an extra full-image layout copy —
    together 2.4 ms/img at the bench shape vs ~0.2 ms for the matmul
    formulation (round-3 hlo_stats profile).
    """

    features: int
    patch_size: int
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, Hp, Wp, p*p*C) space-to-depth'd patches
        p, c, d = self.patch_size, self.in_channels, self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (p, p, c, d)
        )
        bias = self.param("bias", nn.initializers.zeros, (d,))
        k = kernel.reshape(p * p * c, d).astype(self.dtype)
        return x @ k + bias.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Stride-16 patchifier (`models/vision_transformer.py:126-140`),
    computed as space-to-depth + matmul (see ``_PatchProj``)."""

    embed_dim: int
    patch_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) channel-last (TPU layout)
        b, h, w, c = x.shape
        p = self.patch_size
        hp, wp = h // p, w // p
        x = x.astype(self.dtype)
        # space-to-depth: (B, Hp, p, Wp, p, C) -> (B, Hp, Wp, p, p, C);
        # the (p, p, C) patch order matches the conv kernel's reshape
        x = x.reshape(b, hp, p, wp, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp, wp, p * p * c)
        return _PatchProj(
            self.embed_dim, p, c, dtype=self.dtype, name="proj"
        )(x)  # (B, Hp, Wp, D)


class Conv3x3Matmul(nn.Module):
    """3x3 SAME conv computed as 9 shifted ``(HW, Cin) @ (Cin, Cout)``
    einsums accumulated in f32.

    Parameter-compatible with ``nn.Conv(features, (3, 3), padding=1)``
    (same "kernel"/(3,3,Cin,Cout) and "bias" shapes, so checkpoints
    interchange). Exists for layout robustness, not FLOPs: inside the
    full train graph XLA ran the stride-4 FPN/RPN convolutions at
    ~36 TF/s in whatever tiled layout the surrounding graph imposed
    (fpn_conv_0 fwd+dgrad+wgrad ~6 ms/step at 800x1344), while the same
    convolution slope-timed 0.55 ms isolated (144 TF/s). Dots force
    canonical (8,128)-tiled operands, so a relayout copy (~0.05 ms)
    replaces the 4x-degraded convolution.
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", self.kernel_init, (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                v = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), x.shape)
                t = jnp.einsum(
                    "bhwc,cd->bhwd", v, k[dy, dx],
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        return (acc + bias.astype(jnp.float32)).astype(self.dtype)


class Deconv2x2Matmul(nn.Module):
    """2x2-stride-2 transposed conv as one matmul + pixel shuffle.

    With kernel == stride there is no tap overlap: every output 2x2
    block is an independent linear map of one input pixel, i.e. a
    single ``(HW, Cin) @ (Cin, 4*Cout)`` dot plus a reshape.
    Parameter-compatible with ``nn.ConvTranspose(features, (2, 2),
    strides=(2, 2))``. Same layout rationale as ``Conv3x3Matmul`` (the
    ViT fpn1 deconvs measured 2.1 ms/step in-graph vs ~0.15 ms of
    matmul at the same FLOPs).
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", self.kernel_init, (2, 2, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # flax ConvTranspose applies the spatially MIRRORED kernel
        # (lax.conv_transpose semantics); flip so parameters interchange
        k = kernel[::-1, ::-1].astype(self.dtype)
        y = jnp.einsum(
            "bhwc,ijcd->bhiwjd", x, k, preferred_element_type=jnp.float32
        )
        y = y + bias.astype(jnp.float32)
        return y.reshape(b, 2 * h, 2 * w, self.features).astype(self.dtype)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """Fixed 2-D sin-cos positional embedding (MAE convention)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)

    def emb_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = emb_1d(embed_dim // 2, grid[0])
    emb_w = emb_1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim), np.float32), pos], axis=0)
    return pos


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, hp: int, wp: int, num_prefix: int = 1
) -> jnp.ndarray:
    """Bicubic-resize the patch grid of a (1, P + prefix, D) pos embed.

    Matches ``interpolate_pos_encoding`` (`models/vision_transformer.py:
    187-207`): the stored square grid is resized to (hp, wp) with torch
    bicubic (A=-0.75) half-pixel sampling.
    """
    from ..ops.image import resize

    prefix = pos_embed[:, :num_prefix]
    patch = pos_embed[:, num_prefix:]
    n = patch.shape[1]
    side = int(round(float(np.sqrt(n))))
    if side * side != n:
        raise ValueError(f"pos embed grid is not square: {n}")
    if (side, side) == (hp, wp):
        return pos_embed
    d = patch.shape[-1]
    grid = patch.reshape(1, side, side, d).transpose(0, 3, 1, 2)  # (1, D, s, s)
    grid = resize(grid, (hp, wp), method="bicubic")
    grid = grid.transpose(0, 2, 3, 1).reshape(1, hp * wp, d)
    return jnp.concatenate([prefix, grid], axis=1)
