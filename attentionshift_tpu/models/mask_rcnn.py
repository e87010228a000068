"""Standard Mask R-CNN for pseudo-label self-training refinement.

The paper's strongest VOC row (AttnShift-dagger: 70.3/57.1/30.4,
`figures/Perform-VOC.jpg`) retrains a stock Mask R-CNN on the pseudo
boxes/masks produced by the point-supervised stage — the vendored
mmdetection zoo supplies it upstream (`mmdet/models/detectors/
mask_rcnn.py`, `roi_heads/bbox_heads/convfc_bbox_head.py`,
`mask_heads/fcn_mask_head.py`). This module is the TPU-native
equivalent: ResNet-FPN (or any 4-level pyramid), anchor RPN, shared-2FC
box head, FCN mask head — all fixed-shape, one jittable train loss.

Pseudo-label flow: ``tools/gen_pseudo_labels.py`` dumps
``seed_pseudo_gt`` outputs to a COCO-style json; ``data.refine`` feeds
them back here as (boxes, labels, masks).

Design notes (TPU):
- FPN-level RoI routing (mmdet ``map_roi_levels``) is computed per roi,
  and features are extracted from all 4 levels then masked-selected —
  data-independent shapes instead of per-level ragged batching.
- Mask targets are cropped from stride-``mask_stride`` ground-truth
  bitmaps (28x28 targets need nowhere near full resolution; stride 4
  keeps the host->device mask traffic and the target crop gather 16x
  smaller than full res).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.anchors import grid_anchors, grid_anchors_per_level
from ..core.assign import max_iou_assign, random_sample
from ..core.boxes import bbox2delta, delta2bbox
from ..core.losses import smooth_l1_loss, softmax_cross_entropy
from ..core.postprocess import Detections, multiclass_nms
from ..ops.roi_align import roi_align
from .fpn import FPN
from .resnet import ResNet
from .rpn import RPNHead, rpn_loss, rpn_proposals

__all__ = ["MaskRCNN", "StdBoxHead", "StdMaskHead", "MaskRCNNTestOutputs"]

REG_STDS = (0.1, 0.1, 0.2, 0.2)  # mmdet DeltaXYWHBBoxCoder target_stds


class StdBoxHead(nn.Module):
    """mmdet ``Shared2FCBBoxHead``: flatten 7x7 rois -> 2 fc(1024) ->
    softmax cls (C+1) + class-specific box deltas (4C)."""

    num_classes: int = 20
    fc_channels: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: (N, 7, 7, C). Returns cls (N, C+1), reg (N, 4C)."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_channels, dtype=self.dtype, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="fc_reg")(x)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)


class StdMaskHead(nn.Module):
    """mmdet ``FCNMaskHead``: 4x conv3x3(256) -> deconv x2 -> 1x1 conv."""

    num_classes: int = 20
    conv_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray):
        """roi_feats: (N, 14, 14, C) -> logits (N, 28, 28, num_classes)."""
        x = roi_feats
        for i in range(4):
            x = nn.relu(
                nn.Conv(
                    self.conv_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"conv{i + 1}",
                )(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.conv_channels, (2, 2), strides=(2, 2), dtype=self.dtype,
                name="upsample",
            )(x)
        )
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits")(x)
        return x.astype(jnp.float32)


class MaskRCNNTestOutputs(NamedTuple):
    # field names match ``detector.TestOutputs`` so ``eval.runner`` /
    # ``tools/test.py`` work with either detector
    dets: Detections  # boxes/scores/labels/valid, (B, K, ...)
    mask_probs: jnp.ndarray  # (B, K, 28, 28) probabilities for the det class


def _rois_with_batch_idx(boxes: jnp.ndarray) -> jnp.ndarray:
    b, n = boxes.shape[:2]
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), n)[:, None]
    return jnp.concatenate([idx, boxes.reshape(b * n, 4)], axis=1)


class MaskRCNN(nn.Module):
    num_classes: int = 20
    # rpn
    rpn_channels: int = 256
    num_proposals: int = 1000
    rpn_nms_pre: int = 2000
    # rcnn
    rcnn_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    mask_sample_cap: int = 128
    mask_stride: int = 4  # resolution divisor of incoming gt masks
    with_mask: bool = True  # False = plain Faster R-CNN (stock zoo)
    # backbone
    depths: tuple = (3, 4, 6, 3)
    frozen_stages: int = 1
    # test
    test_score_thr: float = 0.05
    test_iou_thr: float = 0.5
    test_max_per_img: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depths=self.depths, frozen_stages=self.frozen_stages,
            dtype=self.dtype, name="backbone",
        )
        self.neck = FPN(
            out_channels=self.rpn_channels, num_outs=5, dtype=self.dtype, name="neck"
        )
        self.rpn_head = RPNHead(
            feat_channels=self.rpn_channels, dtype=self.dtype, name="rpn_head"
        )
        self.bbox_head = StdBoxHead(
            num_classes=self.num_classes, dtype=self.dtype, name="bbox_head"
        )
        if self.with_mask:
            self.mask_head = StdMaskHead(
                num_classes=self.num_classes, dtype=self.dtype, name="mask_head"
            )

    # ------------------------------------------------------------- shared
    def _features(self, img):
        c2345 = self.backbone(img)
        return self.neck(c2345)  # P2..P6

    def _roi_feats(self, fpn_feats, boxes, output_size):
        """FPN-routed RoIAlign (mmdet ``SingleRoIExtractor`` semantics).

        boxes: (B, N, 4). Every roi is extracted from all 4 levels and
        the `floor(4 + log2(sqrt(area)/224))` level is selected — static
        shapes, 4x the flops of ragged routing but no recompiles.
        Returns (B*N, S, S, C) channel-last.
        """
        rois = _rois_with_batch_idx(boxes)
        wh = jnp.maximum(rois[:, 3:5] - rois[:, 1:3], 1e-6)
        scale = jnp.sqrt(wh[:, 0] * wh[:, 1])
        lvl = jnp.floor(jnp.log2(scale / 224.0 + 1e-6)) + 4
        lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32) - 2  # 0..3 over P2..P5
        crops = []
        for i in range(4):
            f = fpn_feats[i].transpose(0, 3, 1, 2)  # BCHW
            crops.append(
                roi_align(f, rois, spatial_scale=1.0 / (4 * 2**i),
                          output_size=output_size, sampling_ratio=2)
            )
        stacked = jnp.stack(crops, axis=0)  # (4, N, C, S, S)
        sel = jnp.take_along_axis(
            stacked, lvl[None, :, None, None, None], axis=0
        )[0]
        return sel.transpose(0, 2, 3, 1)

    # -------------------------------------------------------------- train
    def __call__(self, img, gt_boxes, gt_labels, gt_masks, gt_valid, img_wh, *,
                 loss_enable=1.0):
        """Fully-supervised training forward on (pseudo) labels.

        Args:
            img: (B, H, W, 3) normalised padded images.
            gt_boxes: (B, G, 4) xyxy.
            gt_labels: (B, G) int32.
            gt_masks: (B, G, H/mask_stride, W/mask_stride) uint8 bitmaps.
            gt_valid: (B, G) bool.
        """
        b, h, w, _ = img.shape
        g = gt_boxes.shape[1]
        s = self.rcnn_samples
        rng = self.make_rng("sampling")
        k_rpn, k_samp, k_mask = jax.random.split(rng, 3)

        fpn_feats = self._features(img)
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        anchors = grid_anchors(featmap_sizes)
        losses = dict(
            rpn_loss(k_rpn, cls_scores, bbox_preds, anchors, gt_boxes, gt_valid)
        )
        props = rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=self.rpn_nms_pre, max_per_img=self.num_proposals,
        )

        # ---- proposal assignment + sampling (gt added as proposals)
        def sample_one(key, boxes, valid, gts, glbl, gval):
            all_boxes = jnp.concatenate([gts, boxes], axis=0)
            all_valid = jnp.concatenate([gval, valid], axis=0)
            assign = max_iou_assign(
                all_boxes, gts, glbl, gval, pos_iou_thr=0.5, neg_iou_thr=0.5,
                min_pos_iou=0.5, match_low_quality=False,
            )
            assigned = jnp.where(all_valid, assign.assigned_gt, -1)
            samp = random_sample(key, assigned, s, self.rcnn_pos_fraction)
            k1, _ = jax.random.split(key)
            score = (
                samp.pos_mask.astype(jnp.float32) * 2.0
                + samp.neg_mask.astype(jnp.float32)
                + jax.random.uniform(k1, assigned.shape) * 0.5
            )
            _, idx = jax.lax.top_k(score, s)
            r_assigned = assigned[idx]
            r_pos = samp.pos_mask[idx]
            r_neg = samp.neg_mask[idx]
            pgt = jnp.clip(r_assigned - 1, 0, g - 1)
            r_lbl = jnp.where(r_pos, glbl[pgt], self.num_classes)
            return all_boxes[idx], r_lbl, gts[pgt], r_pos, r_neg, pgt

        rois, labels, tgts, pos, neg, pgt = jax.vmap(sample_one)(
            jax.random.split(k_samp, b), props.boxes, props.valid,
            gt_boxes, gt_labels, gt_valid,
        )

        # ---- box head: softmax CE + class-specific smooth-L1 on deltas
        roi_feats = self._roi_feats(fpn_feats, rois, 7)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        flat_lbl = labels.reshape(-1)
        lw = (pos | neg).reshape(-1).astype(jnp.float32)
        n_samp = jnp.maximum(lw.sum(), 1.0)
        losses["loss_cls"] = (
            softmax_cross_entropy(cls_score, flat_lbl) * lw
        ).sum() / n_samp * loss_enable
        acc = ((jnp.argmax(cls_score, -1) == flat_lbl) * lw).sum() / n_samp * 100.0
        losses["rcnn_acc"] = acc

        deltas_t = bbox2delta(rois.reshape(-1, 4), tgts.reshape(-1, 4), stds=REG_STDS)
        reg = bbox_pred.reshape(-1, self.num_classes, 4)
        reg_c = jnp.take_along_axis(
            reg, jnp.clip(flat_lbl, 0, self.num_classes - 1)[:, None, None], axis=1
        )[:, 0]
        pw = pos.reshape(-1).astype(jnp.float32)
        losses["loss_bbox"] = (
            smooth_l1_loss(reg_c, deltas_t, beta=1.0).sum(-1) * pw
        ).sum() / n_samp * loss_enable

        if not self.with_mask:
            return losses, dict(rois=rois, pos=pos)

        # ---- mask head on a fixed cap of positive rois (clamped to the
        # sampled-roi count so cap > rcnn_samples configs stay valid)
        m = min(self.mask_sample_cap, self.rcnn_samples)

        def pick_pos(key, pos_m):
            score = pos_m.astype(jnp.float32) + jax.random.uniform(key, pos_m.shape) * 0.5
            _, idx = jax.lax.top_k(score, m)
            return idx, pos_m[idx]

        pidx, pvalid = jax.vmap(pick_pos)(jax.random.split(k_mask, b), pos)
        mrois = jnp.take_along_axis(rois, pidx[..., None], axis=1)  # (B, M, 4)
        mlabels = jnp.clip(
            jnp.take_along_axis(labels, pidx, axis=1), 0, self.num_classes - 1
        )
        mgt = jnp.take_along_axis(pgt, pidx, axis=1)  # (B, M)

        mask_feats = self._roi_feats(fpn_feats, mrois, 14)
        mask_logits = self.mask_head(mask_feats)  # (B*M, 28, 28, C)
        logits_c = jnp.take_along_axis(
            mask_logits, mlabels.reshape(-1)[:, None, None, None], axis=3
        )[..., 0]  # (B*M, 28, 28)

        # 28x28 targets: RoIAlign crop of the matched gt bitmap
        own_masks = jnp.take_along_axis(
            gt_masks, mgt[..., None, None], axis=1
        ).reshape(b * m, 1, *gt_masks.shape[2:]).astype(jnp.float32)
        crop_rois = jnp.concatenate(
            [
                jnp.arange(b * m, dtype=jnp.float32)[:, None],
                mrois.reshape(-1, 4) / self.mask_stride,
            ],
            axis=1,
        )
        tgt = roi_align(own_masks, crop_rois, 1.0, output_size=28, sampling_ratio=2)
        tgt = (tgt[:, 0] >= 0.5).astype(jnp.float32)  # (B*M, 28, 28)

        bce = jnp.maximum(logits_c, 0) - logits_c * tgt + jnp.log1p(
            jnp.exp(-jnp.abs(logits_c))
        )
        mw = pvalid.reshape(-1).astype(jnp.float32)
        losses["loss_mask"] = (
            (bce.mean(axis=(1, 2)) * mw).sum() / jnp.maximum(mw.sum(), 1.0)
        ) * loss_enable
        return losses, dict(rois=rois, pos=pos)

    # ---------------------------------------------------- aug-test stages
    # same stage contract as ``AttnShiftDetector`` so ``eval.aug_test.
    # AugTester`` (the reference's 6-scale x flip protocol) drives either
    # detector unchanged
    def rpn_test(self, img):
        """Backbone + RPN proposals in this augmentation's frame."""
        b, h, w, _ = img.shape
        fpn_feats = self._features(img)
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        return rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=1000, max_per_img=self.num_proposals,
        )

    def roi_test(self, img, rois, img_wh):
        """Box head on given rois: softmax scores + per-class decoded boxes.

        ``img_wh``: (B, 2) true (w, h) of this augmentation's frame —
        boxes clip to it, matching ``simple_test`` / mmdet ``img_shape``
        semantics (never the padded canvas).
        """
        b = img.shape[0]
        r = rois.shape[1]
        fpn_feats = self._features(img)
        roi_feats = self._roi_feats(fpn_feats, rois, 7)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        scores = jax.nn.softmax(cls_score, -1).reshape(b, r, -1)
        decoded = jax.vmap(
            lambda rois_i, d, wh: delta2bbox(
                jnp.repeat(rois_i, self.num_classes, axis=0),
                d.reshape(-1, 4), max_shape=(wh[1], wh[0]), stds=REG_STDS,
            ).reshape(r, self.num_classes, 4)
        )(rois, bbox_pred.reshape(b, r, -1), img_wh)
        return scores, decoded

    def mask_test(self, img, rois, labels):
        """Mask head on given rois -> (B, R, 28, 28) probs of ``labels``."""
        b = img.shape[0]
        r = rois.shape[1]
        if not self.with_mask:  # Faster R-CNN variant: full-box masks
            return jnp.ones((b, r, 28, 28), jnp.float32)
        fpn_feats = self._features(img)
        mask_feats = self._roi_feats(fpn_feats, rois, 14)
        logits = self.mask_head(mask_feats)
        probs = jax.nn.sigmoid(logits).reshape(b, r, 28, 28, self.num_classes)
        return jnp.take_along_axis(
            probs, labels[..., None, None, None], axis=-1
        )[..., 0]

    # --------------------------------------------------------------- test
    def simple_test(self, img, img_wh):
        """(B, K) detections + 28x28 mask probabilities (host pastes)."""
        b, h, w, _ = img.shape
        fpn_feats = self._features(img)
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        props = rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=1000, max_per_img=self.num_proposals,
        )
        r = props.boxes.shape[1]
        roi_feats = self._roi_feats(fpn_feats, props.boxes, 7)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        scores = jax.nn.softmax(cls_score, -1).reshape(b, r, -1)
        boxes_c = jax.vmap(
            lambda rois_i, d, wh: delta2bbox(
                jnp.repeat(rois_i, self.num_classes, axis=0),
                d.reshape(-1, 4), max_shape=(wh[1], wh[0]), stds=REG_STDS,
            ).reshape(r, self.num_classes * 4)
        )(props.boxes, bbox_pred.reshape(b, r, -1), img_wh)

        def nms_one(bx, sc, val):
            return multiclass_nms(
                bx, sc, self.test_score_thr, self.test_iou_thr,
                self.test_max_per_img, box_valid=val,
            )

        dets = jax.vmap(nms_one)(boxes_c, scores, props.valid)
        k = dets.boxes.shape[1]
        if not self.with_mask:
            # Faster R-CNN: full-box masks so the shared eval path works
            return MaskRCNNTestOutputs(
                dets=dets, mask_probs=jnp.ones((b, k, 28, 28), jnp.float32)
            )

        mask_feats = self._roi_feats(fpn_feats, dets.boxes, 14)
        mask_logits = self.mask_head(mask_feats)  # (B*K, 28, 28, C)
        lbl = dets.labels.reshape(-1)
        probs = jax.nn.sigmoid(
            jnp.take_along_axis(mask_logits, lbl[:, None, None, None], axis=3)[..., 0]
        )
        return MaskRCNNTestOutputs(dets=dets, mask_probs=probs.reshape(b, k, 28, 28))
