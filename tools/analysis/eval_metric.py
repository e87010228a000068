"""Offline metric (re-)evaluation of a saved predictions dump.

Covers the reference's ``tools/analysis_tools/eval_metric.py`` (recompute
metrics from a results pickle without re-running inference): feed it the
``--dump-preds`` output of ``tools/test.py`` and pick metric / IoU
thresholds freely — useful for sweeping thresholds or switching between
VOC07 mask mAP and COCO AP on the same predictions.

    python tools/analysis/eval_metric.py preds.pkl [--iou 0.25 0.5 0.75]
    python tools/analysis/eval_metric.py preds.pkl --coco
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump", help="pickle from tools/test.py --dump-preds")
    ap.add_argument("--iou", type=float, nargs="*", default=[0.25, 0.5, 0.75],
                    help="VOC mask-mAP IoU thresholds")
    ap.add_argument("--coco", action="store_true",
                    help="force COCO segm AP even for a VOC dump")
    ap.add_argument("--per-class", action="store_true",
                    help="also print per-class APs (VOC metric)")
    args = ap.parse_args()

    with open(args.dump, "rb") as f:
        d = pickle.load(f)
    preds, gts = d["preds"], d["gts"]
    num_classes = d["num_classes"]

    results = {}
    if args.coco or d.get("is_coco"):
        from attentionshift_tpu.eval.coco_eval import coco_segm_eval

        res = coco_segm_eval(
            preds["masks"], preds["labels"], preds["scores"],
            gts["masks"], gts["labels"], num_classes=num_classes,
            gt_iscrowd=gts.get("crowd"),
        )
        results = {k: float(res[k]) for k in ("AP", "AP50", "AP75")}
    else:
        from attentionshift_tpu.eval.mean_ap_segm import eval_map_segm

        for thr in args.iou:
            mAP, aps, _ = eval_map_segm(
                preds["masks"], preds["labels"], preds["scores"],
                gts["masks"], gts["labels"], num_classes=num_classes,
                iou_thresh=thr,
            )
            results[f"mAP@{thr}"] = float(mAP)
            if args.per_class:
                results[f"per_class@{thr}"] = [float(a) for a in aps]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
