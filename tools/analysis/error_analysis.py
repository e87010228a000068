"""Detection/segmentation error breakdown over a predictions dump.

Covers the reference's ``tools/analysis_tools/coco_error_analysis.py``
(error-type attribution): each prediction from a ``--dump-preds`` pickle
is classified by mask IoU against the GT —

- ``correct``    IoU >= iou-thr against a same-class GT,
- ``loc``        0.1 <= IoU < iou-thr against a same-class GT (localisation),
- ``cls``        IoU >= 0.1 against a different-class GT (classification),
- ``dup``        correct-IoU match to a GT already claimed by a
                 higher-scoring prediction (duplicate),
- ``bg``         IoU < 0.1 against every GT (background/hallucination);

unmatched GTs are ``missed``. Reported overall and per class, plus the
oracle APs ("AP if loc errors were fixed" etc. in the reference) as the
fraction of predictions recoverable per error type.

    python tools/analysis/error_analysis.py preds.pkl [--iou-thr 0.5] [--out e.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import numpy as np


def mask_iou_matrix(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """(P, H, W) x (G, H, W) boolean masks -> (P, G) IoU."""
    if len(pred) == 0 or len(gt) == 0:
        return np.zeros((len(pred), len(gt)), np.float32)
    p = pred.reshape(len(pred), -1).astype(np.float32)
    g = gt.reshape(len(gt), -1).astype(np.float32)
    inter = p @ g.T
    union = p.sum(1)[:, None] + g.sum(1)[None] - inter
    return inter / np.maximum(union, 1.0)


def analyze(preds: dict, gts: dict, iou_thr: float, num_classes: int) -> dict:
    kinds = ("correct", "loc", "cls", "dup", "bg")
    per_class = {k: np.zeros(num_classes, np.int64) for k in kinds}
    per_class["missed"] = np.zeros(num_classes, np.int64)
    n_img = len(preds["labels"])
    for i in range(n_img):
        pm, pl_, ps = preds["masks"][i], preds["labels"][i], preds["scores"][i]
        gm, gl = gts["masks"][i], gts["labels"][i]
        order = np.argsort(-np.asarray(ps))
        iou = mask_iou_matrix(np.asarray(pm), np.asarray(gm))
        claimed = np.zeros(len(gl), bool)
        for j in order:
            c = int(pl_[j])
            same = np.asarray(gl) == c
            kind = "bg"
            if iou.shape[1]:
                best_same = (iou[j] * same).max() if same.any() else 0.0
                best_other = (iou[j] * ~same).max() if (~same).any() else 0.0
                if best_same >= iou_thr:
                    g = int(np.argmax(iou[j] * same))
                    if claimed[g]:
                        kind = "dup"
                    else:
                        claimed[g] = True
                        kind = "correct"
                elif best_same >= 0.1:
                    kind = "loc"
                elif best_other >= 0.1:
                    kind = "cls"
            per_class[kind][c] += 1
        for g, lab in enumerate(np.asarray(gl)):
            if not claimed[g]:
                per_class["missed"][int(lab)] += 1

    totals = {k: int(v.sum()) for k, v in per_class.items()}
    n_pred = sum(totals[k] for k in kinds)
    n_gt = totals["correct"] + totals["missed"]
    report = dict(
        iou_thr=iou_thr,
        n_predictions=n_pred,
        n_gt=n_gt,
        totals=totals,
        rates={k: round(totals[k] / max(n_pred, 1), 4) for k in kinds},
        recall=round(totals["correct"] / max(n_gt, 1), 4),
        # oracle gains: fraction of predictions that become correct if
        # one error type were fixed (the reference's "supercategory/
        # localisation oracle" curves, in scalar form)
        oracle=dict(
            fix_loc=round((totals["correct"] + totals["loc"]) / max(n_pred, 1), 4),
            fix_cls=round((totals["correct"] + totals["cls"]) / max(n_pred, 1), 4),
            remove_bg=round(
                totals["correct"] / max(n_pred - totals["bg"], 1), 4
            ),
        ),
        per_class={k: v.tolist() for k, v in per_class.items()},
    )
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", help="pickle from tools/test.py --dump-preds")
    ap.add_argument("--iou-thr", type=float, default=0.5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    with open(args.dump, "rb") as f:
        d = pickle.load(f)
    rep = analyze(d["preds"], d["gts"], args.iou_thr, d["num_classes"])
    compact = {k: rep[k] for k in rep if k != "per_class"}
    print(json.dumps(compact, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
