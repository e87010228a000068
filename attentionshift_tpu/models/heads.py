"""RoI heads: MIL layer selection, ViT-decoder box head, point-sup mask head.

TPU-native rebuilds of the reference's three novel RoI sub-heads
(SURVEY.md section 2.5):

- ``MILHead``  <- ``MAEBoxHeadMIL``
  (`mmdet/models/roi_heads/bbox_heads/mae_bbox_head_mil.py:19-169`):
  WSDDN-style two-branch MIL that scores the per-layer CAM candidate
  boxes and returns the best layer per instance + a bag loss.
- ``BoxHeadRec`` <- ``MAEBoxHeadRec``
  (`mae_bbox_head_rec.py:23-264`): 4-block ViT decoder over 7x7 RoI
  tokens with a det token; softmax classification + class-wise box
  regression (GIoU on decoded boxes).
- ``MaskHeadPointSup`` <- ``MAEMaskHeadPointSup``
  (`mae_mask_head_pointSup.py:33-479`): 4-block ViT decoder over 14x14
  RoI tokens + fixed sin-cos pos embed, x2 bicubic upsample, 1x1 conv to
  per-class 28x28 logits; trained with BCE at sampled points only
  (target label 2 = ignore).

All feature maps are channel-last. Fixed-size/padded batches with
validity masks replace the reference's ragged lists; every loss takes an
explicit weight/valid array so padding contributes exactly zero.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.boxes import delta2bbox
from ..core.losses import giou_loss, softmax_cross_entropy
from ..ops.image import resize
from .layers import Block, get_2d_sincos_pos_embed

__all__ = [
    "MILHead",
    "BoxHeadRec",
    "MaskHeadPointSup",
    "mask_point_loss",
    "reconstruction_loss",
]


def _decoder_pos_embed(embed_dim: int, base_grid: int, hp: int, wp: int) -> jnp.ndarray:
    """Fixed sin-cos pos embed stored at ``base_grid`` and bicubic-resized.

    The reference keeps a (base_grid^2 + 1) fixed sin-cos table and
    bicubic-interpolates its patch part to the RoI grid
    (`mae_bbox_head_rec.py:126-146`); values therefore differ slightly
    from a natively computed hp x wp sin-cos grid, which we reproduce.
    """
    pe = get_2d_sincos_pos_embed(embed_dim, base_grid, cls_token=True)
    cls, patch = pe[:1], pe[1:]
    if (hp, wp) != (base_grid, base_grid):
        grid = jnp.asarray(patch).reshape(base_grid, base_grid, embed_dim)
        grid = grid.transpose(2, 0, 1)  # (D, g, g)
        grid = resize(grid, (hp, wp), method="bicubic")
        patch = grid.transpose(1, 2, 0).reshape(hp * wp, embed_dim)
    else:
        patch = jnp.asarray(patch)
    return jnp.concatenate([jnp.asarray(cls), patch], axis=0)  # (1+hp*wp, D)


class MILHead(nn.Module):
    """Two-branch MIL over per-layer candidate boxes (WSDDN-style).

    forward contract (`mae_bbox_head_mil.py:140-169`): RoI features of
    all (instance, layer) candidate boxes -> per-instance best layer
    index + binary-CE bag loss against the instance's class label.
    """

    num_classes: int = 20
    in_channels: int = 384
    embed_dim: int = 256
    hidden_dim: int = 1024
    num_layers_query: int = 7
    roi_size: int = 7
    loss_mil_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats, gt_labels, valid):
        """Args:
            roi_feats: (G, L, S, S, Cin) RoIAlign features of the L
                per-layer candidate boxes of each (padded) instance.
            gt_labels: (G,) class ids.
            valid: (G,) instance validity.

        Returns:
            best_layer: (G,) int32 argmax layer per instance,
            mil_loss: scalar bag loss (padding excluded).
        """
        g, l, s, _, cin = roi_feats.shape
        x = roi_feats.reshape(g * l, s * s, cin)
        if cin != self.embed_dim:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = nn.Dense(self.embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        x = x.reshape(g * l, s * s * self.embed_dim)
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x))
        cls_pred = nn.Dense(self.num_classes, dtype=self.dtype, name="classification_branch")(x)
        prop_pred = nn.Dense(self.num_classes, dtype=self.dtype, name="proposal_branch")(x)
        # probability-space log below: the whole bag chain runs in f32
        # (apex-O1 keeps softmax/log fp32 too). In bf16, clip's upper
        # bound 1 - 1e-6 rounds to exactly 1.0, so a saturated bag_sum
        # reaches log(0) and the one-hot column computes 0 * -inf = NaN
        # — which froze ALL training via apply_if_finite (round-5 fix).
        cls_pred = jax.nn.softmax(
            cls_pred.reshape(g, l, self.num_classes).astype(jnp.float32), axis=-1)
        prop_pred = jax.nn.softmax(
            prop_pred.reshape(g, l, self.num_classes).astype(jnp.float32), axis=-2)
        bag = cls_pred * prop_pred  # (G, L, C) f32

        bag_cls = jnp.take_along_axis(
            bag, gt_labels[:, None, None].astype(jnp.int32), axis=-1
        )[..., 0]  # (G, L)
        best_layer = jnp.argmax(bag_cls, axis=-1).astype(jnp.int32)

        bag_sum = jnp.clip(bag.sum(axis=1), 1e-6, 1.0 - 1e-6)  # (G, C)
        onehot = jax.nn.one_hot(gt_labels, self.num_classes, dtype=bag_sum.dtype)
        loss = -(onehot * jnp.log(bag_sum) + (1.0 - onehot) * jnp.log(1.0 - bag_sum))
        loss = jnp.where(valid[:, None], loss, 0.0)
        denom = jnp.maximum(valid.sum() * self.num_classes, 1.0)
        return best_layer, self.loss_mil_factor * loss.sum() / denom


class BoxHeadRec(nn.Module):
    """ViT-decoder box head (`mae_bbox_head_rec.py:148-167`)."""

    num_classes: int = 20
    in_channels: int = 384
    embed_dim: int = 256
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    base_grid: int = 14  # img_size(224)/patch(16): pos-embed storage grid
    reg_class_agnostic: bool = False
    with_reconstruct: bool = False
    patch_size: int = 16
    # fused attention kernel for the decoder blocks: at the RCNN's
    # (512 rois, 50 tokens) shape the jnp path materialises f32
    # (R, H, N, N) logits; the pallas kernel measured 0.239 -> 0.161
    # ms/block fwd+bwd (round-5 train-step work)
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """Args:
            roi_feats: (R, S, S, Cin) RoIAlign features.

        Returns:
            cls_score: (R, num_classes + 1) logits,
            bbox_pred: (R, 4) or (R, num_classes*4) deltas,
            rec_pred: (R, S, S, 3*patch^2) or None.
        """
        r, s, _, cin = roi_feats.shape
        x = roi_feats.reshape(r, s * s, cin)
        if cin != self.embed_dim:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = nn.Dense(self.embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        det_token = self.param(
            "det_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(det_token, (r, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        x = x + _decoder_pos_embed(self.embed_dim, self.base_grid, s, s).astype(x.dtype)
        for i in range(self.depth):
            x, _ = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"decoder_blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_box_norm")(x)
        cls_score = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")(x[:, 0])
        out_reg = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_pred = nn.Dense(out_reg, dtype=self.dtype, name="fc_reg")(x[:, 0])
        rec = None
        if self.with_reconstruct:
            rec = nn.Dense(3 * self.patch_size**2, dtype=self.dtype, name="fc_rec")(
                x[:, 1:]
            ).reshape(r, s, s, -1)
        return cls_score, bbox_pred, rec

    def loss(
        self,
        cls_score,
        bbox_pred,
        rois,
        labels,
        label_weights,
        bbox_targets,
        bbox_weights,
        target_stds=(0.1, 0.1, 0.2, 0.2),
        bbox_loss_weight: float = 10.0,
        loss_enable: jnp.ndarray | float = 1.0,
    ):
        """Classification + GIoU-on-decoded-boxes loss
        (`mae_bbox_head_rec.py:170-263`); padding rows carry
        ``label_weights == 0``.

        ``loss_enable`` is the epoch-gated ``loss_weight_bbox_start``.
        """
        losses = {}
        avg = jnp.maximum((label_weights > 0).sum().astype(jnp.float32), 1.0)
        losses["loss_cls"] = (
            softmax_cross_entropy(cls_score, labels, weight=label_weights, avg_factor=avg)
            * loss_enable
        )
        pred_cls = jnp.argmax(cls_score, axis=-1)
        correct = (pred_cls == labels) & (label_weights > 0)
        losses["acc"] = 100.0 * correct.sum() / avg

        pos = (labels >= 0) & (labels < self.num_classes) & (bbox_weights[:, 0] > 0)
        if self.reg_class_agnostic:
            sel_pred = bbox_pred.reshape(-1, 4)
        else:
            sel_pred = jnp.take_along_axis(
                bbox_pred.reshape(bbox_pred.shape[0], -1, 4),
                jnp.clip(labels, 0, self.num_classes - 1)[:, None, None],
                axis=1,
            )[:, 0]
        decoded = delta2bbox(rois, sel_pred, stds=target_stds)
        lb = giou_loss(
            decoded,
            bbox_targets,
            weight=pos.astype(jnp.float32),
            avg_factor=jnp.asarray(labels.shape[0], jnp.float32),
        )
        losses["loss_bbox"] = bbox_loss_weight * lb * loss_enable
        return losses


class MaskHeadPointSup(nn.Module):
    """ViT-decoder mask head (`mae_mask_head_pointSup.py:172-190`)."""

    num_classes: int = 20
    in_channels: int = 384
    embed_dim: int = 256
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 4.0
    base_grid: int = 14
    scale_factor: int = 2
    scale_mode: str = "bicubic"
    # pallas attention for the decoder: at (128 rois, 196 tokens) the
    # jnp path's f32 (R, 8, 196, 196) logits made these blocks the
    # mask head's hot spot; measured 0.394 -> 0.200 ms/block fwd+bwd
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """(R, S, S, Cin) RoI features -> (R, sf*S, sf*S, num_classes)."""
        r, s, _, cin = roi_feats.shape
        x = roi_feats.reshape(r, s * s, cin)
        if cin != self.embed_dim:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            x = nn.Dense(self.embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        pe = _decoder_pos_embed(self.embed_dim, self.base_grid, s, s)[1:]
        x = x + pe.astype(x.dtype)
        for i in range(self.depth):
            x, _ = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"decoder_blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="decoder_box_norm")(x)
        x = x.reshape(r, s, s, self.embed_dim)
        up = s * self.scale_factor
        # torch interpolate(align_corners=True) on (B, C, H, W); ours is
        # channel-last so resize the middle axes
        x = resize(
            x.transpose(0, 3, 1, 2), (up, up), method=self.scale_mode, align_corners=True
        ).transpose(0, 2, 3, 1)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits")(x)


def reconstruction_loss(
    rec_pred: jnp.ndarray,
    rois: jnp.ndarray,
    img: jnp.ndarray,
    roi_valid: jnp.ndarray,
    patch_size: int = 16,
    rec_weight: float = 1.0,
) -> jnp.ndarray:
    """Per-patch normalised-pixel reconstruction MSE for the optional
    ``with_reconstruct`` branch of the box head
    (`mae_bbox_head_rec.py:222-263`): the per-patch RGB prediction of
    each RoI is compared against the per-patch-normalised crop of the
    input image at the RoI.

    Args:
        rec_pred: (R, S, S, 3*patch^2) fc_rec output.
        rois: (R, 5) [batch_idx, xyxy] image-coordinate boxes.
        img: (B, H, W, 3) normalised input images.
        roi_valid: (R,) contribution mask.
    """
    from ..ops.roi_align import roi_align as _ra

    r, s, _, _ = rec_pred.shape
    p = patch_size
    # crop each roi at patch-pixel resolution (S*p x S*p)
    crop = _ra(
        img.transpose(0, 3, 1, 2), rois, spatial_scale=1.0, output_size=s * p
    ).transpose(0, 2, 3, 1)  # (R, S*p, S*p, 3)
    tgt = crop.reshape(r, s, p, s, p, 3).transpose(0, 1, 3, 2, 4, 5)
    tgt = tgt.reshape(r, s, s, p * p, 3)
    mu = tgt.mean(axis=3, keepdims=True)
    var = tgt.var(axis=3, keepdims=True)
    tgt = ((tgt - mu) / jnp.sqrt(var + 1e-6)).reshape(r, s, s, 3 * p * p)
    # reference layout: (p, p, 3) per patch flattened; ours (p*p, 3) — both
    # are per-patch pixel sets under the same normalisation statistics
    err = ((rec_pred.astype(jnp.float32) - tgt) ** 2).mean(axis=(1, 2, 3))
    err = jnp.where(roi_valid, err, 0.0)
    return rec_weight * err.sum() / jnp.maximum(roi_valid.sum(), 1.0)


def mask_point_loss(
    point_preds: jnp.ndarray,
    point_targets: jnp.ndarray,
    labels: jnp.ndarray,
    pos_valid: jnp.ndarray,
    loss_enable: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """BCE at sampled points with ignore label 2
    (`mae_mask_head_pointSup.py:234-275`, invoked from
    `stdroi_point_deform_attn_reppoints.py:3146-3160`).

    The reference's ``reduction='mean'`` with a 0/1 weight divides by the
    TOTAL element count (ignored points still count in the denominator);
    we mirror that, with padded rows additionally masked out.

    Args:
        point_preds: (R, P, num_classes) sampled mask logits.
        point_targets: (R, P) in {0, 1, 2}; 2 = ignore.
        labels: (R,) class id per RoI.
        pos_valid: (R,) True for real positive RoIs, False for padding.
    """
    r = point_preds.shape[0]
    logits = jnp.take_along_axis(
        point_preds, labels[:, None, None].astype(jnp.int32), axis=-1
    )[..., 0]  # (R, P)
    tgt = point_targets.astype(jnp.float32)
    ignore = point_targets == 2
    bce = jnp.maximum(logits, 0) - logits * jnp.where(ignore, 0.0, tgt) + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    w = (~ignore) & pos_valid[:, None]
    bce = jnp.where(w, bce, 0.0)
    denom = jnp.maximum(pos_valid.sum() * point_targets.shape[1], 1.0)
    return (bce.sum() / denom) * loss_enable
