"""Brute-force oracle for the VOC eval protocol (chainercv semantics).

An independent, deliberately-naive transcription of chainercv's
``calc_instance_segmentation_voc_prec_rec`` +
``calc_detection_voc_ap`` — the exact functions the reference imports
(`/root/reference/mmdet/core/evaluation/mean_ap_segm.py:7`). chainercv
is not installed in this environment, so this transcription (simple
Python loops, per-pixel set IoU, no vectorised shortcuts shared with
the production code) is the adversarial ground truth that
``attentionshift_tpu/eval/mean_ap_segm.py`` is fuzzed against
(VERDICT round-2 item 3).

Semantics pinned here:
- per (image, class): predictions sorted by score (stable sort,
  reversed — chainercv's ``argsort()[::-1]`` tie order);
- each prediction is judged against its ARGMAX-IoU gt only; if that gt
  is below ``iou_thresh`` -> FP; if already claimed -> FP (NO re-match
  to a second-best gt); the argmax gt is claimed either way;
- per class, globally: (score, match) pairs re-sorted by score,
  precision = tp/(tp+fp), recall = tp/n_pos;
- AP: 11-point interpolation (07 metric) or area-under-PR;
  classes never seen in preds or gts -> NaN; mAP = nanmean.
"""

from __future__ import annotations

import numpy as np


def _iou_masks(a: np.ndarray, b: np.ndarray) -> float:
    """Per-pixel boolean IoU via explicit counting."""
    inter = int(np.logical_and(a, b).sum())
    union = int(np.logical_or(a, b).sum())
    return inter / union if union else 0.0


def _iou_boxes(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
    return inter / ua if ua > 0 else 0.0


def _prec_rec(pred_items, pred_labels, pred_scores, gt_items, gt_labels,
              iou_thresh, iou_fn, num_classes):
    n_pos = [0] * num_classes
    score = [[] for _ in range(num_classes)]
    match = [[] for _ in range(num_classes)]
    seen = set()

    for pi, pl, ps, gi, gl in zip(
        pred_items, pred_labels, pred_scores, gt_items, gt_labels
    ):
        labels_here = set(int(x) for x in pl) | set(int(x) for x in gl)
        seen |= labels_here
        for l in sorted(labels_here):
            psel = [k for k in range(len(pl)) if int(pl[k]) == l]
            # chainercv per-image order: argsort()[::-1] == stable
            # ascending reversed
            psel = [psel[k] for k in
                    np.asarray([ps[k] for k in psel]).argsort(kind="stable")[::-1]]
            gsel = [k for k in range(len(gl)) if int(gl[k]) == l]
            n_pos[l] += len(gsel)
            claimed = [False] * len(gsel)
            for k in psel:
                score[l].append(float(ps[k]))
                if not gsel:
                    match[l].append(0)
                    continue
                ious = [iou_fn(pi[k], gi[j]) for j in gsel]
                best = int(np.argmax(ious))
                if ious[best] < iou_thresh:
                    match[l].append(0)
                    continue
                match[l].append(0 if claimed[best] else 1)
                claimed[best] = True

    prec = [None] * num_classes
    rec = [None] * num_classes
    for l in range(num_classes):
        if l not in seen:
            continue
        sc = np.asarray(score[l], np.float64)
        mt = np.asarray(match[l], np.int64)
        order = sc.argsort(kind="stable")[::-1]
        mt = mt[order]
        tp = np.cumsum(mt == 1)
        fp = np.cumsum(mt == 0)
        prec[l] = tp / (tp + fp) if len(mt) else np.zeros((0,))
        rec[l] = (tp / n_pos[l]) if n_pos[l] > 0 else None
    return prec, rec


def _voc_ap(prec, rec, use_07_metric):
    n = len(prec)
    ap = np.empty(n)
    for l in range(n):
        if prec[l] is None or rec[l] is None:
            ap[l] = np.nan
            continue
        if use_07_metric:
            a = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                sel = [p for p, r in zip(np.nan_to_num(prec[l]), rec[l]) if r >= t]
                a += (max(sel) if sel else 0.0) / 11.0
            ap[l] = a
        else:
            mpre = np.concatenate(([0.0], np.nan_to_num(prec[l]), [0.0]))
            mrec = np.concatenate(([0.0], rec[l], [1.0]))
            for i in range(len(mpre) - 2, -1, -1):
                mpre[i] = max(mpre[i], mpre[i + 1])
            a = 0.0
            for i in range(len(mrec) - 1):
                if mrec[i + 1] != mrec[i]:
                    a += (mrec[i + 1] - mrec[i]) * mpre[i + 1]
            ap[l] = a
    return ap


def oracle_eval_segm(pred_masks, pred_labels, pred_scores, gt_masks,
                     gt_labels, num_classes, iou_thresh=0.5,
                     use_07_metric=True):
    prec, rec = _prec_rec(pred_masks, pred_labels, pred_scores, gt_masks,
                          gt_labels, iou_thresh, _iou_masks, num_classes)
    ap = _voc_ap(prec, rec, use_07_metric)
    mean = float(np.nanmean(ap)) if np.isfinite(ap).any() else float("nan")
    return mean, ap


def oracle_eval_boxes(pred_boxes, pred_labels, pred_scores, gt_boxes,
                      gt_labels, num_classes, iou_thresh=0.5,
                      use_07_metric=True):
    prec, rec = _prec_rec(pred_boxes, pred_labels, pred_scores, gt_boxes,
                          gt_labels, iou_thresh, _iou_boxes, num_classes)
    ap = _voc_ap(prec, rec, use_07_metric)
    mean = float(np.nanmean(ap)) if np.isfinite(ap).any() else float("nan")
    return mean, ap
