"""FPN neck (stock mmdet ``FPN`` semantics, channel-last).

The reference config (`configs/mae/attnshift_voc12aug.py:37-41`) uses a
plain FPN over the 4 same-dim ViT pyramid levels -> 5 outputs of 256ch
(`mmdet/models/necks/fpn.py`): 1x1 lateral convs, nearest-neighbour
top-down addition, 3x3 output convs, and (num_outs > len(inputs),
add_extra_convs=False) an extra stride-2 max-pool level. It feeds ONLY
the RPN — RoI heads read the raw ViT feature (roi_skip_fpn=True).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv3x3Matmul

__all__ = ["FPN"]


def _upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        """inputs: tuple of (B, H_i, W_i, C) maps, fine -> coarse, each
        exactly 2x the next one's resolution. Returns ``num_outs`` maps."""
        n_in = len(inputs)
        # mmdet FPN init parity: Xavier-uniform convs (`mmdet/models/
        # necks/fpn.py` init_cfg Xavier). The flax default lecun_normal
        # is close in scale but Xavier matches the reference exactly.
        init = nn.initializers.xavier_uniform()
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=init,
                    dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(n_in - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest2x(laterals[i])
        # matmul-form 3x3 convs (layout robustness — see Conv3x3Matmul):
        # parameter-compatible with the nn.Conv they replace
        outs = [
            Conv3x3Matmul(
                self.out_channels, kernel_init=init,
                dtype=self.dtype, name=f"fpn_conv_{i}"
            )(laterals[i])
            for i in range(n_in)
        ]
        # extra levels: torch max_pool2d(kernel=1, stride=2) == strided
        # subsampling with ceil output size (mmdet FPN default)
        while len(outs) < self.num_outs:
            outs.append(outs[-1][:, ::2, ::2, :])
        return tuple(outs)
