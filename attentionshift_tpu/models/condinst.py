"""Dynamic-filter keypoint-align head (CondInst-style).

Rebuilds ``SimpleCondInstHead``
(`mmdet/models/dense_heads/simple_condinst_head.py:162-319`): each
instance token generates the parameters of a small per-instance MLP
("dynamic convs", 1x1 so really matmuls) through a linear controller
(`:227`); part features are projected by a shared MLP (`:144-159`) and
scored by every instance's dynamic network (`dynamic_conv_forward:253`);
the supervision is a cross-entropy over instances for each part
(`forward_single:297-319`, ``loss_keypoint_align`` scaled by 0.1).

The reference's parameter parsing (`parse_dynamic_params:230-251`)
implicitly requires the part projection width to equal the dynamic
width (``feat_channels``); we make that explicit. Ragged instance/part
lists become fixed slots with validity masks: invalid parts contribute
zero loss, invalid instances are masked out of the softmax.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SimpleCondInstHead"]


class _MLP(nn.Module):
    """ReLU MLP (`simple_condinst_head.py:144-159`)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(self.output_dim)(x)


class SimpleCondInstHead(nn.Module):
    """Per-instance dynamic scoring of part features.

    Args (call):
        token_feats: (N, Dt) instance (point-token) features.
        part_feats: (P, Dp) semantic-part features.
        part_labels: (P,) int32 owning-instance slot per part.
        part_valid: (P,) bool.
        token_valid: (N,) bool.

    Returns:
        dict with ``loss_keypoint_align``.
    """

    feat_channels: int = 8
    num_layers: int = 3
    mlp_hidden: int = 256
    mlp_num_layers: int = 3
    loss_weight: float = 0.1

    def _param_sizes(self) -> tuple[Sequence[int], Sequence[int]]:
        c = self.feat_channels
        weights, biases = [], []
        for i in range(self.num_layers):
            if i == self.num_layers - 1:
                weights.append(c * 1)
                biases.append(1)
            else:
                weights.append(c * c)
                biases.append(c)
        return weights, biases

    @nn.compact
    def __call__(self, token_feats, part_feats, part_labels, part_valid,
                 token_valid):
        lead = token_feats.shape[:-2]  # optional batch dims
        n = token_feats.shape[-2]
        p = part_feats.shape[-2]
        c = self.feat_channels
        w_sizes, b_sizes = self._param_sizes()
        num_params = sum(w_sizes) + sum(b_sizes)

        params = nn.Dense(num_params, name="controller")(token_feats)  # (..., N, S)
        feats = _MLP(self.mlp_hidden, c, self.mlp_num_layers,
                     name="part_feature_head")(part_feats)  # (..., P, C)

        # split controller output into per-layer weights/biases
        offsets = []
        off = 0
        for s in list(w_sizes) + list(b_sizes):
            offsets.append((off, off + s))
            off += s

        x = jnp.broadcast_to(
            feats[..., None, :, :, None], lead + (n, p, c, 1)
        )
        for i in range(self.num_layers):
            wo = offsets[i]
            bo = offsets[self.num_layers + i]
            out_dim = 1 if i == self.num_layers - 1 else c
            w = params[..., wo[0]:wo[1]].reshape(lead + (n, 1, out_dim, c))
            b = params[..., bo[0]:bo[1]].reshape(lead + (n, 1, out_dim, 1))
            x = jnp.matmul(w, x) + b  # batch dims broadcast, (..., N, P, out, 1)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        logits = jnp.swapaxes(x[..., 0, 0], -1, -2)  # (..., P, N)

        logits = jnp.where(token_valid[..., None, :], logits, -1e9)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = jnp.clip(part_labels, 0, n - 1)
        ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        valid = part_valid & jnp.take_along_axis(token_valid, tgt, axis=-1)
        loss = -(ll * valid).sum() / jnp.maximum(valid.sum(), 1.0)
        return {"loss_keypoint_align": loss * self.loss_weight}
