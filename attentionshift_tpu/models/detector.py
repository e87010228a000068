"""AttnShift detector: point-supervised two-stage detector, TPU-native.

Orchestration rebuild of ``TwoStageDetectorPointSupAlign`` +
``FasterRCNNPointSupAlign`` + ``AttnShiftRoIHead``
(`mmdet/models/detectors/two_stage_point_align.py:18-165`,
`mmdet/models/roi_heads/stdroi_point_deform_attn_reppoints.py:1326-3221`)
as ONE flax module whose train/test paths are pure jittable functions:

train (`forward_train``):
  backbone -> Stage A (Hungarian token match -> rollout CAMs -> candidate
  boxes -> MIL best-layer selection) -> Stage B/C (refined fg/bg maps,
  mask points, mean-shift semantic centers) -> RPN trained on pseudo
  boxes -> RCNN box head on sampled proposals -> mask head supervised at
  sampled points. Returns the loss dict (keys mirror the reference).

test (``simple_test``):
  backbone -> RPN proposals -> box head -> decode + multiclass NMS ->
  mask head on detections. Mask pasting happens host-side in eval.

Every stage is fixed-shape: gt instances padded to ``max_gt`` with
validity masks, proposals to ``num_proposals``, RCNN samples to
``rcnn_samples``. Batch is handled by vmapping the per-image engine.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.anchors import grid_anchors, grid_anchors_per_level
from ..core.assign import hungarian_point_assign, max_iou_assign, random_sample
from ..core.boxes import clip_boxes, delta2bbox
from ..core.losses import l1_loss, sigmoid_focal_loss
from ..core.postprocess import Detections, multiclass_nms
from ..ops.image import resize
from ..ops.roi_align import roi_align
from ..ops.sampling import point_sample
from ..pseudo.engine import candidate_boxes, masks_and_centers
from ..pseudo.rollout import attention_rollout_point_rows
from .condinst import SimpleCondInstHead
from .fpn import FPN
from .heads import BoxHeadRec, MILHead, MaskHeadPointSup, mask_point_loss
from .mae_head import MAEDecoderHead
from .reppoints import RepPointsPartHead, contour_points, refine_fg_maps
from .rpn import RPNHead, rpn_loss, rpn_proposals
from .vit import VisionTransformerDet

__all__ = ["AttnShiftDetector", "TestOutputs"]


class TestOutputs(NamedTuple):
    dets: Detections  # boxes/scores/labels/valid, (B, K, ...)
    mask_probs: jnp.ndarray  # (B, K, 28, 28) sigmoid probs of det class


def _rois_with_batch_idx(boxes: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 4) -> (B*N, 5) [batch_idx, x1, y1, x2, y2]."""
    b, n, _ = boxes.shape
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), n)[:, None]
    return jnp.concatenate([idx, boxes.reshape(b * n, 4)], axis=1)


class AttnShiftDetector(nn.Module):
    # model
    num_classes: int = 20
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    img_size: int = 224  # pos-embed storage size
    out_indices: tuple = (3, 5, 7, 11)
    point_tokens: int = 100
    cam_layer: int = 7
    drop_path_rate: float = 0.05
    use_remat: bool = True
    use_pallas_attention: bool = False
    use_pallas_ccl: bool = False
    sequence_parallel: bool = False  # see VisionTransformerDet
    pad_tokens_to: int = 0  # see VisionTransformerDet.pad_tokens_to
    # pseudo-label engine
    max_gt: int = 20
    seed_thr: float = 0.2
    seed_multiple: float = 0.5
    # CAMs are bilinear upsamplings of 16px-granular patch attention;
    # thresholding/CCL at cam_stride=16 (= the ViT patch stride, so the
    # CCL plane IS the attention capture grid) DOMINATES finer strides
    # on candidate-box fidelity vs exact stride-1 semantics at both
    # studied geometries (FIDELITY.md: 800x1344 p10/p50/p90
    # 0.44/0.97/1.00 vs stride-8's 0.29/0.87/0.99; 512x512
    # 0.75/0.94/1.00 vs 0.72/0.96/0.99) — upsampling past the capture
    # grid only adds threshold aliasing at component boundaries — while
    # running CCL/extraction on 4x fewer cells than stride 8. Backbones
    # whose capture grid is NOT stride 16 (Swin captures at stride 32)
    # should set this to their own capture stride or re-gate; see
    # configs/attnshift_voc12aug_swin.py. 1 = exact reference semantics.
    cam_stride: int = 16
    # Stage-B/C maps are likewise bilinear upsamples of patch-res data;
    # running them at stride 4 cuts their HBM traffic 16x (the dominant
    # seed-path cost) for <4px of sampled-point quantisation. 1 = exact
    # reference full-res semantics.
    seed_map_stride: int = 4
    ccl_iters: int = 64
    pos_mask_thr: float = 0.35
    neg_mask_thr: float = 0.8
    num_mask_point_gt: int = 10
    corr_size: int = 21
    obj_tau: float = 0.9
    refine_times: int = 2
    mean_shift_times: int = 10
    num_semantic_points: int = 5
    # rpn / rcnn
    rpn_channels: int = 256
    num_proposals: int = 1000
    rpn_nms_pre: int = 2000
    rcnn_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    mask_sample_cap: int = 128
    # keypoint-align variant (`FasterRCNNPointSupAlignKeyPoint`,
    # `faster_rcnn_pointSup_keypoint_align.py:8-165`): instance tokens
    # generate dynamic classifiers over semantic-part features
    with_keypoint_align: bool = False
    keypoint_feat_channels: int = 8
    # RepPoints part-refinement cascade (COCO path, `stdroi:2663-2717`):
    # num_reppoints_head heads over detached stride-16 features; heads
    # beyond the first re-estimate fg maps from the refined centers
    # (`update_fg_map`, `stdroi:2737-2760`). with_deform_sup feeds the
    # refined centers back into the mask head's supervision points
    # (reference hardcodes it False at `stdroi:1390`).
    with_reppoints_head: bool = False
    num_reppoints_head: int = 1
    with_deform_sup: bool = False
    reppoints_num_points: int = 9
    reppoints_contour_points: int = 16
    # MAE auxiliary reconstruction loss on the encoder tokens
    # (`with_mae_head`, `stdroi:2731-2733`; `roi_heads/mae_head.py:22`)
    with_mae_head: bool = False
    mae_mask_ratio: float = 0.75
    # test
    test_score_thr: float = 0.05
    test_iou_thr: float = 0.5
    test_max_per_img: int = 100
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = VisionTransformerDet(
            img_size=self.img_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            drop_path_rate=self.drop_path_rate,
            out_indices=self.out_indices,
            point_tokens_num=self.point_tokens,
            num_classes=self.num_classes,
            capture_layers=self.cam_layer,
            use_remat=self.use_remat,
            use_pallas_attention=self.use_pallas_attention,
            sequence_parallel=self.sequence_parallel,
            pad_tokens_to=self.pad_tokens_to,
            dtype=self.dtype,
            name="backbone",
        )
        self.neck = FPN(out_channels=self.rpn_channels, num_outs=5, dtype=self.dtype, name="neck")
        self.rpn_head = RPNHead(feat_channels=self.rpn_channels, dtype=self.dtype, name="rpn_head")
        self.mil_head = MILHead(
            num_classes=self.num_classes,
            in_channels=self.embed_dim,
            num_layers_query=self.cam_layer,
            dtype=self.dtype,
            name="mil_head",
        )
        # NOTE (round-5 negative result): wiring use_pallas into these
        # two decoder heads looked like a win in isolation (block
        # fwd+bwd 0.39->0.20 ms at the mask head's 196-token shape) but
        # REGRESSED the full train step by ~15 ms: in-graph, XLA
        # surrounds every pallas call with physical relayout copies,
        # token pads (50/196 -> 128/256) and un-pad slices (trace:
        # 14.4 ms bbox_head + 8.4 ms mask_head of attn+copy+pad+slice
        # vs ~6 ms total for the jnp path, whose transposes fuse into
        # the einsums). The heads keep the plumbing for standalone use;
        # the detector deliberately leaves them on the jnp path.
        self.bbox_head = BoxHeadRec(
            num_classes=self.num_classes, in_channels=self.embed_dim,
            dtype=self.dtype, name="bbox_head",
        )
        self.mask_head = MaskHeadPointSup(
            num_classes=self.num_classes, in_channels=self.embed_dim,
            dtype=self.dtype, name="mask_head",
        )
        if self.with_keypoint_align:
            self.keypoint_align_head = SimpleCondInstHead(
                feat_channels=self.keypoint_feat_channels,
                name="keypoint_align_head",
            )
        if self.with_reppoints_head:
            self.reppoints_heads = [
                RepPointsPartHead(
                    num_points=self.reppoints_num_points, dtype=self.dtype,
                    name=f"reppoints_head_{i}",
                )
                for i in range(self.num_reppoints_head)
            ]
        if self.with_mae_head:
            self.mae_head = MAEDecoderHead(
                in_channels=self.embed_dim, mask_ratio=self.mae_mask_ratio,
                dtype=self.dtype, name="mae_head",
            )

    # ------------------------------------------------------------- shared
    def _extract(self, img, deterministic: bool = True):
        out = self.backbone(img, deterministic=deterministic)
        b, h, w, _ = img.shape
        hp, wp = h // 16, w // 16
        # roi source: raw last-block patch tokens (roi_skip_fpn=True,
        # `two_stage_point_sup.py:122-127`), BCHW for roi_align
        roi_map = (
            out["last_feat"][:, 1:]
            .reshape(b, hp, wp, self.embed_dim)
            .transpose(0, 3, 1, 2)
        )
        return out, roi_map, (hp, wp)

    def _roi_feats(self, roi_map, boxes, output_size):
        """(B, N, 4) boxes -> (B*N, S, S, C) channel-last roi features."""
        rois = _rois_with_batch_idx(boxes)
        feats = roi_align(roi_map, rois, spatial_scale=1.0 / 16, output_size=output_size)
        return feats.transpose(0, 2, 3, 1)

    def backbone_forward(self, img):
        """Backbone-only forward (the EMA teacher's share of the work,
        `faster_rcnn_pointSup_align_teacher_student.py:36-90`)."""
        out, _, _ = self._extract(img, deterministic=True)
        return out

    # -------------------------------------------------------------- train
    def __call__(self, img, gt_points, gt_labels, gt_valid, img_wh, *,
                 loss_enable=1.0, teacher=None):
        """Training forward: returns (losses dict, aux dict).

        Args:
            img: (B, H, W, 3) normalised, padded images.
            gt_points: (B, G, 2) annotated instance points (xy, image coords).
            gt_labels: (B, G) int32 class ids.
            gt_valid: (B, G) bool instance validity (padding mask).
            img_wh: (B, 2) true image (w, h) before padding.
            loss_enable: epoch-gated bbox/mask loss switch
                (``LossWeightAdjustHook``; 1.0 from epoch 0 in the VOC cfg).
        """
        b, h, w, _ = img.shape
        out, roi_map, (hp, wp) = self._extract(img, deterministic=False)
        rng = self.make_rng("sampling")
        k_rpn, k_rcnn, k_engine = jax.random.split(rng, 3)

        point_cls = out["outputs_class"]  # (B, P, C)
        point_reg = out["outputs_coord"]  # (B, P, 2)

        # EMA-teacher variant: the pseudo-label engine reads the teacher's
        # attention/features/point predictions; the student's heads train
        seed_src = teacher if teacher is not None else out
        assigned, pseudo_boxes, best_idx, mil_loss, pl = self._seed(
            k_engine, seed_src, roi_map, (hp, wp), (h, w),
            gt_points, gt_labels, gt_valid, img_wh,
        )
        if teacher is not None:
            # point losses match the STUDENT's predictions
            def assign_student(cls_p, reg_p, pts, lbls, val, wh):
                return hungarian_point_assign(
                    jax.lax.stop_gradient(cls_p), jax.lax.stop_gradient(reg_p),
                    pts, lbls, val, wh,
                )

            assigned = jax.vmap(assign_student)(
                point_cls, point_reg, gt_points, gt_labels, gt_valid, img_wh
            )

        losses = {"loss_mil": mil_loss}

        # ---- RPN on pseudo boxes
        fpn_feats = self.neck(out["feature"])
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        anchors = grid_anchors(featmap_sizes)
        losses.update(
            rpn_loss(k_rpn, cls_scores, bbox_preds, anchors, pseudo_boxes, gt_valid)
        )
        props = rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=self.rpn_nms_pre, max_per_img=self.num_proposals,
        )

        # ---- point-token losses (`stdroi:3431-3514`)
        losses.update(
            self._point_losses(point_cls, point_reg, assigned, gt_points, gt_labels, img_wh)
        )

        # ---- RepPoints part-refinement cascade (`stdroi:2663-2717`)
        mask_pt_coords, mask_pt_labels = pl.point_coords, pl.point_labels
        if self.with_reppoints_head:
            k_rp = jax.random.fold_in(rng, 7)
            rp_feats = jax.lax.stop_gradient(fpn_feats[2])  # stride-16 level
            vit_feat_d = jax.lax.stop_gradient(
                out["last_feat"][:, 1:].reshape(b, hp, wp, self.embed_dim)
            ).transpose(0, 3, 1, 2)  # (B, D, Hp, Wp)
            centers = pl.centers.coords  # (B, G, P, 2)
            cvalid = pl.centers.part_valid
            fg_maps, rp_masks = pl.map_fg, pl.pseudo_masks
            for i, head in enumerate(self.reppoints_heads):
                if i > 0:
                    # update_fg_map between cascade stages (`stdroi:2737-2760`)
                    upd_keys = jax.random.split(jax.random.fold_in(k_rp, 100 + i), b)
                    fg_maps, rp_masks = jax.vmap(
                        lambda f, v, bx, c, cv, fp, bp, gv, k: refine_fg_maps(
                            f, v, bx, c, cv, fp, bp, gv, k,
                            pos_mask_thr=self.pos_mask_thr,
                        )
                    )(fg_maps, vit_feat_d, pseudo_boxes, centers, cvalid,
                      pl.fg_proto, pl.bg_proto, gt_valid, upd_keys)
                cont_keys = jax.random.split(jax.random.fold_in(k_rp, i), b)
                cont_xy, cont_val = jax.vmap(
                    lambda m, k: contour_points(
                        m, self.reppoints_contour_points, k
                    )
                )(rp_masks, cont_keys)
                rpo = head(
                    rp_feats, pseudo_boxes, centers, cvalid, gt_valid,
                    rp_masks, fg_maps, cont_xy, cont_val,
                )
                suffix = "" if i == 0 else f"_{i - 1}"
                losses.update({k + suffix: v for k, v in rpo.losses.items()})
                centers, cvalid = rpo.new_centers, rpo.new_valid
            if self.with_deform_sup:
                # refined centers replace the semantic-center positives in
                # the mask supervision points (engine layout: centers are
                # the LAST max_parts entries of point_coords)
                p = centers.shape[2]
                new_xy = jnp.where(cvalid[..., None], centers, -1.0)
                new_lbl = jnp.where(cvalid, 1, 2).astype(mask_pt_labels.dtype)
                mask_pt_coords = jnp.concatenate(
                    [mask_pt_coords[:, :, :-p], new_xy], axis=2
                )
                mask_pt_labels = jnp.concatenate(
                    [mask_pt_labels[:, :, :-p], new_lbl], axis=2
                )

        # ---- RCNN box + mask heads
        losses.update(
            self._rcnn_losses(
                k_rcnn, roi_map, props, pseudo_boxes, gt_labels, gt_valid,
                mask_pt_coords, mask_pt_labels, loss_enable,
            )
        )

        # ---- MAE auxiliary reconstruction (`stdroi:2731-2733`)
        if self.with_mae_head:
            losses["loss_mae_rec"] = self.mae_head(
                out["last_feat"], img, jax.random.fold_in(rng, 11)
            )

        # ---- keypoint-align variant: instance tokens classify their parts
        if self.with_keypoint_align:
            g = gt_points.shape[1]
            npart = pl.centers.feats.shape[2]
            # token slot matched to each gt (argmax over the one-hot match)
            token_of_gt = jnp.argmax(
                assigned[:, None, :] == (jnp.arange(g)[None, :, None] + 1),
                axis=-1,
            ).astype(jnp.int32)  # (B, G)
            tokens = jnp.take_along_axis(
                out["point_tokens"], token_of_gt[..., None], axis=1
            )  # (B, G, D)
            parts = pl.centers.feats.reshape(b, g * npart, -1)
            owner = jnp.tile(jnp.repeat(jnp.arange(g), npart)[None], (b, 1))
            pvalid = pl.centers.part_valid.reshape(b, g * npart)
            pvalid = pvalid & jnp.take_along_axis(gt_valid, owner, axis=1)
            losses.update(
                self.keypoint_align_head(
                    tokens, jax.lax.stop_gradient(parts), owner, pvalid, gt_valid
                )
            )
        aux = dict(
            pseudo_boxes=pseudo_boxes,
            pseudo_valid=gt_valid,
            pseudo_masks=pl.pseudo_masks,
            best_idx=best_idx,
            semantic_centers=pl.centers.coords,
            semantic_valid=pl.centers.part_valid,
            map_fg=pl.map_fg,
        )
        return losses, aux

    def _seed(self, rng, out, roi_map, patch_hw, img_hw, gt_points, gt_labels, gt_valid, img_wh,
              debug: bool = False):
        """Stages A-C (`seed_pseudo_gt`, `stdroi:2209-2415`)."""
        hp, wp = patch_hw
        h, w = img_hw
        b, g = gt_points.shape[:2]
        point_cls = out["outputs_class"]
        point_reg = out["outputs_coord"]

        # ---- Stage A: Hungarian token match + rollout CAMs + candidates
        # backbone maps are softmax outputs -> rowsum(A + I) == 2 exactly
        rollout = attention_rollout_point_rows(
            out["attns"], self.point_tokens, assume_normalized=True
        )
        rollout = rollout.transpose(1, 0, 2, 3)  # (B, L, P, T)

        def assign_one(cls_p, reg_p, pts, lbls, val, wh):
            return hungarian_point_assign(
                jax.lax.stop_gradient(cls_p), jax.lax.stop_gradient(reg_p),
                pts, lbls, val, wh,
            )

        assigned = jax.vmap(assign_one)(
            point_cls, point_reg, gt_points, gt_labels, gt_valid, img_wh
        )  # (B, P) in {0, gt+1}
        # token index per gt: argmax of the one-hot match
        token_of_gt = jnp.argmax(
            assigned[:, None, :] == (jnp.arange(g)[None, :, None] + 1), axis=-1
        ).astype(jnp.int32)  # (B, G)

        def cand_one(rows, tok, pts, val):
            return candidate_boxes(
                rows, tok, pts, (hp, wp), (h, w),
                seed_thr=self.seed_thr, seed_multiple=self.seed_multiple,
                cam_stride=self.cam_stride, ccl_iters=self.ccl_iters,
                use_pallas_ccl=self.use_pallas_ccl, valid=val,
            )

        cand, cams_patch = jax.vmap(cand_one)(
            rollout, token_of_gt, gt_points, gt_valid
        )
        # cand: (B, G, L, 4); cams_patch: (B, L, G, Hp, Wp)

        # ---- MIL best-layer selection (gradients flow into backbone)
        mil_feats = self._roi_feats(roi_map, cand.reshape(b, g * self.cam_layer, 4), 7)
        mil_feats = mil_feats.reshape(b * g, self.cam_layer, 7, 7, self.embed_dim)
        best_idx, mil_loss = self.mil_head(
            mil_feats, gt_labels.reshape(-1), gt_valid.reshape(-1)
        )
        best_idx = best_idx.reshape(b, g)
        pseudo_boxes = jnp.take_along_axis(
            cand, best_idx[..., None, None], axis=2
        )[:, :, 0]  # (B, G, 4)
        pseudo_boxes = jax.lax.stop_gradient(pseudo_boxes)

        # ---- Stages B+C (on detached features, `two_stage_point_align.py:77`)
        vit_feat = jax.lax.stop_gradient(
            out["last_feat"][:, 1:].reshape(b, hp, wp, self.embed_dim)
        ).transpose(0, 3, 1, 2)  # (B, D, Hp, Wp)
        best_cams_patch = jnp.take_along_axis(
            cams_patch.transpose(0, 2, 1, 3, 4),  # (B, G, L, Hp, Wp)
            best_idx[..., None, None, None], axis=2,
        )[:, :, 0]  # (B, G, Hp, Wp)
        ms = self.seed_map_stride
        best_cams = resize(best_cams_patch, (h // ms, w // ms))

        def engine_one(key, cams, feat, boxes, pts, lbls, val):
            return masks_and_centers(
                key, cams, feat, boxes, pts, lbls, val,
                pos_mask_thr=self.pos_mask_thr, neg_mask_thr=self.neg_mask_thr,
                num_mask_point_gt=self.num_mask_point_gt, corr_size=self.corr_size,
                obj_tau=self.obj_tau, refine_times=self.refine_times,
                mean_shift_times=self.mean_shift_times,
                num_semantic_points=self.num_semantic_points,
                map_stride=ms, img_hw=(h, w),
                # Stage-C mean-shift dots in the storage dtype (bf16
                # models): the apex-O1 precision the reference ran these
                # matmuls at; f32 models keep the exact parity chain
                matmul_dtype=(jnp.bfloat16 if self.dtype == jnp.bfloat16
                              else None),
                # same switch as the CCL batch kernel: pallas engine
                # kernels on TPU, jnp elsewhere
                use_pallas_meanshift=self.use_pallas_ccl,
            )

        pl = jax.vmap(engine_one)(
            jax.random.split(rng, b), best_cams, vit_feat,
            pseudo_boxes, gt_points, gt_labels, gt_valid,
        )
        if debug:
            dbg = dict(
                rollout_rows=rollout,
                candidate_boxes=cand,
                cams=cams_patch,
                best_cams=best_cams_patch,
                token_of_gt=token_of_gt,
                vit_feat=vit_feat,
            )
            return assigned, pseudo_boxes, best_idx, mil_loss, pl, dbg
        return assigned, pseudo_boxes, best_idx, mil_loss, pl

    def seed_pseudo_gt(self, img, gt_points, gt_labels, gt_valid, img_wh):
        """Standalone pseudo-label generation (the benchmark path).

        Returns a dict mirroring the reference's ``seed_pseudo_gt`` output
        contract (`stdroi:2377-2415`): pseudo boxes/masks, supervision
        points, semantic centers, the MIL bag loss and best layer index.
        """
        b, h, w, _ = img.shape
        out, roi_map, (hp, wp) = self._extract(img, deterministic=True)
        rng = self.make_rng("sampling")
        _, pseudo_boxes, best_idx, mil_loss, pl = self._seed(
            rng, out, roi_map, (hp, wp), (h, w),
            gt_points, gt_labels, gt_valid, img_wh,
        )
        return dict(
            pseudo_gt_bboxes=pseudo_boxes,
            pseudo_gt_labels=gt_labels,
            pseudo_gt_valid=gt_valid,
            pseudo_gt_masks=pl.pseudo_masks,
            mask_points_coords=pl.point_coords,
            mask_points_labels=pl.point_labels,
            map_cos_fg=pl.map_fg,
            semantic_centers=pl.centers.coords,
            semantic_centers_valid=pl.centers.part_valid,
            best_attn_idx=best_idx,
            loss_mil=mil_loss,
        )

    def seed_debug(self, img, gt_points, gt_labels, gt_valid, img_wh):
        """Pseudo-label generation with every intermediate exposed.

        The visualisation-variant capability
        (``TwoStageDetectorPointSupVis``, `detectors/two_stage_vis.py`,
        ``store_visual_matterials`` in
        `faster_rcnn_pointSup_keypoint_align.py:163-165`): instead of
        stashing tensors on the module, the pure function returns the
        full intermediate dict (rollout rows, per-layer CAMs + candidate
        boxes, MIL choice, refined maps, supervision points, semantic
        centers) for host-side dumping via ``utils.visualize``.
        """
        b, h, w, _ = img.shape
        out, roi_map, (hp, wp) = self._extract(img, deterministic=True)
        rng = self.make_rng("sampling")
        assigned, pseudo_boxes, best_idx, mil_loss, pl, dbg = self._seed(
            rng, out, roi_map, (hp, wp), (h, w),
            gt_points, gt_labels, gt_valid, img_wh, debug=True,
        )
        return dict(
            pseudo_gt_bboxes=pseudo_boxes,
            pseudo_gt_masks=pl.pseudo_masks,
            mask_points_coords=pl.point_coords,
            mask_points_labels=pl.point_labels,
            map_cos_fg=pl.map_fg,
            semantic_centers=pl.centers.coords,
            semantic_centers_valid=pl.centers.part_valid,
            best_attn_idx=best_idx,
            loss_mil=mil_loss,
            assigned=assigned,
            outputs_coord=out["outputs_coord"],
            outputs_class=out["outputs_class"],
            **dbg,
        )

    def _point_losses(self, point_cls, point_reg, assigned, gt_points, gt_labels, img_wh):
        b, p, c = point_cls.shape
        g = gt_points.shape[1]
        matched = assigned > 0  # (B, P)
        gt_idx = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(
            matched, jnp.take_along_axis(gt_labels, gt_idx, axis=1), self.num_classes
        )
        num_pos = jnp.maximum(matched.sum().astype(jnp.float32), 1.0)
        loss_cls = sigmoid_focal_loss(
            point_cls.reshape(-1, c), labels.reshape(-1), avg_factor=num_pos
        )
        tgt_xy = jnp.take_along_axis(
            gt_points, gt_idx[..., None], axis=1
        ) / img_wh[:, None, :]
        loss_pt = l1_loss(
            point_reg, tgt_xy,
            weight=matched.astype(jnp.float32)[..., None],
            avg_factor=num_pos,
        )
        pos_logits = point_cls.reshape(-1, c)
        pos_lab = labels.reshape(-1)
        pos_mask = matched.reshape(-1)
        acc = (
            ((jnp.argmax(pos_logits, -1) == pos_lab) & pos_mask).sum()
            / num_pos * 100.0
        )
        return {
            "loss_point_cls": loss_cls,
            "loss_point": 10.0 * loss_pt,
            "pos_point_acc": acc,
        }

    def _rcnn_losses(
        self, rng, roi_map, props, pseudo_boxes, gt_labels, gt_valid,
        mask_pt_coords, mask_pt_labels, loss_enable,
    ):
        b = pseudo_boxes.shape[0]
        g = pseudo_boxes.shape[1]
        s = self.rcnn_samples
        keys = jax.random.split(rng, b)

        def sample_one(key, boxes, valid, gts, glbl, gval):
            # add_gt_as_proposals=True (`attnshift_voc12aug.py:172`)
            all_boxes = jnp.concatenate([gts, boxes], axis=0)
            all_valid = jnp.concatenate([gval, valid], axis=0)
            assign = max_iou_assign(
                all_boxes, gts, glbl, gval, pos_iou_thr=0.5, neg_iou_thr=0.5,
                min_pos_iou=0.5, match_low_quality=False,
            )
            assigned = jnp.where(all_valid, assign.assigned_gt, -1)
            samp = random_sample(key, assigned, s, self.rcnn_pos_fraction)
            # fixed-size gather: positives first, then negatives
            k1, _ = jax.random.split(key)
            score = (
                samp.pos_mask.astype(jnp.float32) * 2.0
                + samp.neg_mask.astype(jnp.float32)
                + jax.random.uniform(k1, assigned.shape) * 0.5
            )
            _, idx = jax.lax.top_k(score, s)
            rois = all_boxes[idx]
            r_assigned = assigned[idx]
            r_pos = samp.pos_mask[idx]
            r_neg = samp.neg_mask[idx]
            r_lbl = jnp.where(
                r_pos, glbl[jnp.clip(r_assigned - 1, 0, g - 1)], self.num_classes
            )
            r_tgt = gts[jnp.clip(r_assigned - 1, 0, g - 1)]
            return rois, r_lbl, r_tgt, r_pos, r_neg, jnp.clip(r_assigned - 1, 0, g - 1)

        rois, labels, tgts, pos, neg, pgt = jax.vmap(sample_one)(
            keys, props.boxes, props.valid, pseudo_boxes, gt_labels, gt_valid
        )

        roi_feats = self._roi_feats(roi_map, rois, 7)  # (B*S, 7, 7, D)
        cls_score, bbox_pred, _ = self.bbox_head(roi_feats)
        lw = (pos | neg).reshape(-1).astype(jnp.float32)
        bw = pos.reshape(-1).astype(jnp.float32)[:, None] * jnp.ones((1, 4))
        box_losses = self.bbox_head.loss(
            cls_score, bbox_pred, rois.reshape(-1, 4), labels.reshape(-1),
            lw, tgts.reshape(-1, 4), bw, loss_enable=loss_enable,
        )

        # ---- mask head on positive rois only (fixed cap, clamped to the
        # sampled-roi count so cap > rcnn_samples configs stay valid)
        m = min(self.mask_sample_cap, self.rcnn_samples)
        k2 = jax.random.fold_in(rng, 1)

        def pick_pos(key, pos_m):
            score = pos_m.astype(jnp.float32) + jax.random.uniform(key, pos_m.shape) * 0.5
            _, idx = jax.lax.top_k(score, m)
            return idx, pos_m[idx]

        pidx, pvalid = jax.vmap(pick_pos)(jax.random.split(k2, b), pos)
        mrois = jnp.take_along_axis(rois, pidx[..., None], axis=1)  # (B, M, 4)
        mlabels = jnp.take_along_axis(labels, pidx, axis=1)
        mgt = jnp.take_along_axis(pgt, pidx, axis=1)  # (B, M) matched gt slot

        mask_feats = self._roi_feats(roi_map, mrois, 14)
        mask_logits = self.mask_head(mask_feats)  # (B*M, 28, 28, C)

        # per-roi supervision points from the matched gt
        pts = jnp.take_along_axis(
            mask_pt_coords, mgt[..., None, None], axis=1
        )  # (B, M, NP, 2)
        plbl = jnp.take_along_axis(mask_pt_labels, mgt[..., None], axis=1)
        # box-normalised coords; outside [0,1] -> ignore (`stdroi:3146-3152`)
        wh_box = jnp.maximum(mrois[..., 2:4] - mrois[..., 0:2], 1e-6)
        rel = (pts - mrois[..., None, 0:2]) / wh_box[..., None, :]
        outside = (
            (rel[..., 0] < 0) | (rel[..., 0] > 1) | (rel[..., 1] < 0) | (rel[..., 1] > 1)
        )
        plbl = jnp.where(outside, 2, plbl)
        npnt = rel.shape[2]
        preds = point_sample(
            mask_logits.transpose(0, 3, 1, 2), rel.reshape(b * m, npnt, 2)
        ).transpose(0, 2, 1)  # (B*M, NP, C)
        loss_mask = mask_point_loss(
            preds, plbl.reshape(b * m, npnt),
            jnp.clip(mlabels, 0, self.num_classes - 1).reshape(-1),
            pvalid.reshape(-1), loss_enable=loss_enable,
        )
        return {**box_losses, "loss_mask": loss_mask}

    # ---------------------------------------------------- aug-test stages
    def rpn_test(self, img):
        """Backbone + RPN proposals in this augmentation's frame."""
        b, h, w, _ = img.shape
        out, _, _ = self._extract(img)
        fpn_feats = self.neck(out["feature"])
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        return rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=1000, max_per_img=self.num_proposals,
        )

    def roi_test(self, img, rois, img_wh):
        """Box head on given rois: softmax scores + per-class decoded boxes.

        ``rois``: (B, R, 4) in this augmentation's frame; ``img_wh``:
        (B, 2) true (w, h) of that frame before padding. Decoded boxes
        clip to the true extent — the same semantics as ``simple_test``
        (mmdet clips to ``img_shape``, never the padded canvas, in both
        paths: `two_stage_point_sup.py:288-300` / `aug_test`).
        """
        b, h, w, _ = img.shape
        _, roi_map, _ = self._extract(img)
        r = rois.shape[1]
        roi_feats = self._roi_feats(roi_map, rois, 7)
        cls_score, bbox_pred, _ = self.bbox_head(roi_feats)
        scores = jax.nn.softmax(cls_score, axis=-1).reshape(b, r, -1)
        deltas = bbox_pred.reshape(b, r, self.num_classes, 4)
        decoded = delta2bbox(rois[:, :, None, :], deltas, stds=(0.1, 0.1, 0.2, 0.2))
        decoded = self._clip_to_wh(decoded, img_wh)
        return scores, decoded

    @staticmethod
    def _clip_to_wh(boxes, img_wh):
        """Clip (B, ..., 4) xyxy boxes to per-image true (w, h)."""
        extra = (None,) * (boxes.ndim - 2)
        wmax = img_wh[(slice(None), 0) + extra]
        hmax = img_wh[(slice(None), 1) + extra]
        return jnp.stack(
            [
                jnp.clip(boxes[..., 0], 0, wmax),
                jnp.clip(boxes[..., 1], 0, hmax),
                jnp.clip(boxes[..., 2], 0, wmax),
                jnp.clip(boxes[..., 3], 0, hmax),
            ],
            axis=-1,
        )

    def mask_test(self, img, rois, labels):
        """Mask head on given rois -> (B, R, 28, 28) probs of ``labels``."""
        b = img.shape[0]
        r = rois.shape[1]
        _, roi_map, _ = self._extract(img)
        mask_feats = self._roi_feats(roi_map, rois, 14)
        logits = self.mask_head(mask_feats)
        probs = jax.nn.sigmoid(logits).reshape(b, r, 28, 28, self.num_classes)
        return jnp.take_along_axis(
            probs, labels[..., None, None, None], axis=-1
        )[..., 0]

    # --------------------------------------------------------------- test
    def simple_test(self, img, img_wh):
        """Single-scale inference. ``img_wh``: (B, 2) true (w, h)."""
        b, h, w, _ = img.shape
        out, roi_map, _ = self._extract(img)
        return self.test_from_feats(out, roi_map, img_wh, (h, w))

    def test_from_feats(self, out, roi_map, img_wh, img_hw):
        """`simple_test` from precomputed backbone outputs.

        Split out so CAM tools can differentiate the detection score
        w.r.t. the backbone activations (``utils/det_cam.py``, the
        `DetCAMVisualizer` rebuild): ``jax.vjp`` over THIS function with
        ``roi_map`` as the input gives grad-CAM's per-channel weights.
        """
        h, w = img_hw
        b = roi_map.shape[0]
        fpn_feats = self.neck(out["feature"])
        cls_scores, bbox_preds = self.rpn_head(fpn_feats)
        featmap_sizes = [f.shape[1:3] for f in fpn_feats]
        props = rpn_proposals(
            cls_scores, bbox_preds, grid_anchors_per_level(featmap_sizes),
            (h, w), nms_pre=1000, max_per_img=self.num_proposals,
        )
        roi_feats = self._roi_feats(roi_map, props.boxes, 7)
        cls_score, bbox_pred, _ = self.bbox_head(roi_feats)
        n = self.num_proposals
        scores = jax.nn.softmax(cls_score, axis=-1).reshape(b, n, -1)
        deltas = bbox_pred.reshape(b, n, self.num_classes, 4)
        rois = props.boxes  # (B, N, 4)
        decoded = delta2bbox(
            rois[:, :, None, :], deltas, stds=(0.1, 0.1, 0.2, 0.2)
        )  # (B, N, C, 4)
        # clip to the true image area (shared with roi_test)
        decoded = self._clip_to_wh(decoded, img_wh)

        def nms_one(bx, sc, val):
            return multiclass_nms(
                bx.reshape(n, -1), sc, self.test_score_thr, self.test_iou_thr,
                self.test_max_per_img, box_valid=val,
            )

        dets = jax.vmap(nms_one)(decoded, scores, props.valid)

        mask_feats = self._roi_feats(roi_map, dets.boxes, 14)
        mask_logits = self.mask_head(mask_feats)  # (B*K, 28, 28, C)
        k = self.test_max_per_img
        probs = jax.nn.sigmoid(mask_logits).reshape(b, k, 28, 28, self.num_classes)
        sel = jnp.take_along_axis(
            probs, dets.labels[..., None, None, None], axis=-1
        )[..., 0]  # (B, K, 28, 28)
        return TestOutputs(dets=dets, mask_probs=sel)
