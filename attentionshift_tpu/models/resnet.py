"""ResNet backbone (channel-last, frozen-BN detection flavour).

TPU-native counterpart of the stock mmdetection ResNet family
(`mmdet/models/backbones/resnet.py`) that the reference's vendored tree
ships and that the paper's "+MRCNN refinement" row (AttnShift-dagger,
`figures/Perform-VOC.jpg`) relies on: a standard Mask R-CNN with a
ResNet-50-FPN re-trained on the pseudo labels. Detection practice keeps
BatchNorm in eval mode with frozen affine parameters (mmdet
``norm_eval=True`` + ``requires_grad=False``); functionally that is a
per-channel affine constant, which is how ``FrozenBN`` implements it —
no batch statistics, no cross-device sync, bf16-safe.

Weight init from torchvision checkpoints via
``convert.torchvision_resnet_params``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResNet", "FrozenBN"]


class FrozenBN(nn.Module):
    """BatchNorm folded to a frozen per-channel affine transform.

    Parameters live in the params tree (so checkpoint conversion can
    fill them) but are wrapped in ``stop_gradient`` — they never train,
    matching mmdet's ``norm_eval=True, requires_grad=False``.
    """

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        scale, bias, mean, var = (
            jax.lax.stop_gradient(p) for p in (scale, bias, mean, var)
        )
        mul = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) with projection shortcut (style
    'pytorch': the stride sits on the 3x3, torchvision/mmdet default)."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f, d = self.features, self.dtype
        y = nn.Conv(f, (1, 1), use_bias=False, dtype=d, name="conv1")(x)
        y = nn.relu(FrozenBN(f, dtype=d, name="bn1")(y))
        y = nn.Conv(
            f, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=d, name="conv2",
        )(y)
        y = nn.relu(FrozenBN(f, dtype=d, name="bn2")(y))
        y = nn.Conv(4 * f, (1, 1), use_bias=False, dtype=d, name="conv3")(y)
        y = FrozenBN(4 * f, dtype=d, name="bn3")(y)
        if self.project:
            x = nn.Conv(
                4 * f, (1, 1), strides=self.stride, use_bias=False,
                dtype=d, name="downsample_conv",
            )(x)
            x = FrozenBN(4 * f, dtype=d, name="downsample_bn")(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    """ResNet-{50,101,...} returning the (C2, C3, C4, C5) pyramid.

    Args mirror mmdet: ``frozen_stages=1`` freezes the stem + layer1
    (implemented as a ``stop_gradient`` cut on the activations, which
    zeroes exactly those layers' parameter gradients).
    """

    depths: Sequence[int] = (3, 4, 6, 3)  # resnet50
    base_width: int = 64
    frozen_stages: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jnp.ndarray):
        """img: (B, H, W, 3) normalised; H, W divisible by 32.

        Returns 4 maps (B, H/4, W/4, 256) ... (B, H/32, W/32, 2048).
        """
        d = self.dtype
        x = nn.Conv(
            self.base_width, (7, 7), strides=2, padding=3, use_bias=False,
            dtype=d, name="conv1",
        )(img.astype(d))
        x = nn.relu(FrozenBN(self.base_width, dtype=d, name="bn1")(x))
        # torch maxpool(3, stride 2, pad 1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for stage, blocks in enumerate(self.depths):
            f = self.base_width * (2**stage)
            for blk in range(blocks):
                first = blk == 0
                x = Bottleneck(
                    f,
                    stride=2 if (first and stage > 0) else 1,
                    project=first,
                    dtype=d,
                    name=f"layer{stage + 1}_{blk}",
                )(x)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
        return tuple(outs)
