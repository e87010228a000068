"""Multi-scale + flip augmented inference (the reference eval protocol).

Rebuilds the two-stage ``aug_test`` path
(`mmdet/models/detectors/two_stage_point_sup.py:302`, driven by
`run_train.py:16-21` with 6 scales x flip,
`configs/_base_/datasets/voc_instance_aug.py:39-53`):

1. RPN proposals from every augmentation, mapped back to the original
   frame and merged with NMS (``merge_aug_proposals`` semantics);
2. the box head scores the shared proposal set under every augmentation;
   scores and decoded boxes are averaged in the original frame
   (``merge_aug_bboxes``);
3. multiclass NMS -> detections;
4. the mask head runs per augmentation on the detected boxes; sigmoid
   probabilities are un-flipped and averaged (``merge_aug_masks``).

Host-side orchestration; each device stage is a jitted detector method.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.postprocess import multiclass_nms
from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD, _pad_to, _resize_keep_ratio
from ..ops.nms import nms

__all__ = ["AugTester"]


class AugTester:
    def __init__(self, model, params, scales: Sequence[tuple[int, int]],
                 flip: bool = True, size_divisor: int = 32):
        self.model = model
        self.params = params
        self.scales = list(scales)
        self.flips = [False, True] if flip else [False]
        self.size_divisor = size_divisor
        self._rpn = jax.jit(
            lambda p, img: model.apply(p, img, method=type(model).rpn_test)
        )
        self._roi = jax.jit(
            lambda p, img, rois, wh: model.apply(
                p, img, rois, wh, method=type(model).roi_test
            )
        )
        self._mask = jax.jit(
            lambda p, img, rois, lbl: model.apply(
                p, img, rois, lbl, method=type(model).mask_test
            )
        )

    def _augment(self, img: np.ndarray, scale, flip):
        aug, wf, hf = _resize_keep_ratio(img, scale)
        if flip:
            aug = aug[:, ::-1]
        h, w = aug.shape[:2]
        pad = lambda v: (v + self.size_divisor - 1) // self.size_divisor * self.size_divisor
        norm = (aug.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        padded = _pad_to(norm, pad(h), pad(w))
        return padded, (wf, hf), (w, h)

    def __call__(self, img: np.ndarray, max_dets: int = 100):
        """img: (H, W, 3) uint8 original image. Returns original-frame
        detections dict(boxes, scores, labels, valid, mask_probs)."""
        orig_h, orig_w = img.shape[:2]
        augs = []
        for scale in self.scales:
            for flip in self.flips:
                padded, sf, awh = self._augment(img, scale, flip)
                augs.append(dict(img=padded[None], sf=sf, awh=awh, flip=flip))

        # --- stage 1: merged proposals in the original frame
        all_boxes, all_scores = [], []
        for a in augs:
            props = self._rpn(self.params, jnp.asarray(a["img"]))
            boxes = np.asarray(props.boxes[0])
            scores = np.asarray(props.scores[0])
            valid = np.asarray(props.valid[0])
            if a["flip"]:
                aw = a["awh"][0]
                boxes = boxes[:, [2, 1, 0, 3]]
                boxes[:, 0] = aw - boxes[:, 0]
                boxes[:, 2] = aw - boxes[:, 2]
            boxes = boxes / np.asarray([a["sf"][0], a["sf"][1]] * 2, np.float32)
            all_boxes.append(boxes[valid])
            all_scores.append(scores[valid])
        cat_boxes = np.concatenate(all_boxes)
        cat_scores = np.concatenate(all_scores)
        n_prop = self.model.num_proposals
        pad_n = max(n_prop, len(cat_boxes))
        pb = np.zeros((pad_n, 4), np.float32)
        ps = np.full((pad_n,), -1.0, np.float32)
        pb[: len(cat_boxes)] = cat_boxes
        ps[: len(cat_scores)] = cat_scores
        keep_idx, keep_valid = nms(
            jnp.asarray(pb), jnp.asarray(ps), 0.7, n_prop, valid=jnp.asarray(ps > -1)
        )
        merged = np.asarray(jnp.asarray(pb)[keep_idx])
        merged_valid = np.asarray(keep_valid)

        # --- stage 2: average box-head outputs over augs
        sum_scores = None
        sum_boxes = None
        for a in augs:
            rois = merged * np.asarray([a["sf"][0], a["sf"][1]] * 2, np.float32)
            if a["flip"]:
                aw = a["awh"][0]
                rois = rois[:, [2, 1, 0, 3]]
                rois[:, 0] = aw - rois[:, 0]
                rois[:, 2] = aw - rois[:, 2]
            scores, decoded = self._roi(
                self.params, jnp.asarray(a["img"]), jnp.asarray(rois)[None],
                jnp.asarray([a["awh"]], jnp.float32),
            )
            scores = np.asarray(scores[0])  # (R, C+1)
            boxes = np.asarray(decoded[0])  # (R, C, 4)
            if a["flip"]:
                aw = a["awh"][0]
                boxes = boxes[:, :, [2, 1, 0, 3]]
                boxes[..., 0] = aw - boxes[..., 0]
                boxes[..., 2] = aw - boxes[..., 2]
            boxes = boxes / np.asarray([a["sf"][0], a["sf"][1]] * 2, np.float32)
            sum_scores = scores if sum_scores is None else sum_scores + scores
            sum_boxes = boxes if sum_boxes is None else sum_boxes + boxes
        avg_scores = sum_scores / len(augs)
        avg_boxes = sum_boxes / len(augs)
        avg_boxes[..., 0::2] = avg_boxes[..., 0::2].clip(0, orig_w)
        avg_boxes[..., 1::2] = avg_boxes[..., 1::2].clip(0, orig_h)

        dets = multiclass_nms(
            jnp.asarray(avg_boxes.reshape(len(merged), -1)),
            jnp.asarray(avg_scores),
            self.model.test_score_thr,
            self.model.test_iou_thr,
            max_dets,
            box_valid=jnp.asarray(merged_valid),
        )
        det_boxes = np.asarray(dets.boxes)
        det_labels = np.asarray(dets.labels)

        # --- stage 3: average mask probs over augs
        sum_masks = None
        for a in augs:
            rois = det_boxes * np.asarray([a["sf"][0], a["sf"][1]] * 2, np.float32)
            if a["flip"]:
                aw = a["awh"][0]
                rois = rois[:, [2, 1, 0, 3]]
                rois[:, 0] = aw - rois[:, 0]
                rois[:, 2] = aw - rois[:, 2]
            probs = np.asarray(
                self._mask(
                    self.params, jnp.asarray(a["img"]), jnp.asarray(rois)[None],
                    jnp.asarray(det_labels)[None],
                )[0]
            )  # (K, 28, 28)
            if a["flip"]:
                probs = probs[:, :, ::-1]
            sum_masks = probs if sum_masks is None else sum_masks + probs
        mask_probs = sum_masks / len(augs)

        return dict(
            boxes=det_boxes,
            scores=np.asarray(dets.scores),
            labels=det_labels,
            valid=np.asarray(dets.valid),
            mask_probs=mask_probs,
        )
