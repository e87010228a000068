"""Shared evaluation loop (tools/test.py + the per-epoch EvalHook).

The reference registers an ``EvalHook`` that runs the val metric every
epoch during training (`attnshift_voc12aug.py:250`,
`mmdet/core/evaluation/eval_hooks.py`); both that and the standalone
test CLI funnel through this function.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.coco import COCOEvalDataset
from ..data.pipeline import TestPipeline
from ..data.voc import VOC_CLASSES
from .coco_eval import coco_segm_eval
from .masks import finalize_detections
from .mean_ap_segm import eval_map_segm

__all__ = ["evaluate"]


def evaluate(
    model,
    params,
    dataset,
    test_scale=(600, 1000),
    limit: int | None = None,
    num_classes: int | None = None,
    aug_tester=None,
    verbose: bool = True,
) -> dict:
    """Single-scale (or aug-test) inference + dataset-appropriate metric.

    Returns a dict of metric name -> value (mAP@{.25,.5,.75} for VOC,
    AP/AP50/AP75 for COCO).
    """
    pipeline = TestPipeline(scale=tuple(test_scale))
    is_coco = isinstance(dataset, COCOEvalDataset)
    if num_classes is None:
        num_classes = dataset.num_classes if is_coco else len(VOC_CLASSES)

    run = jax.jit(
        lambda p, img, wh: model.apply(p, img, wh, method=type(model).simple_test)
    )

    n = len(dataset) if limit is None else min(limit, len(dataset))
    preds = dict(masks=[], labels=[], scores=[])
    gts = dict(masks=[], labels=[], crowd=[])
    t0 = time.time()
    for i in range(n):
        if aug_tester is not None:
            raw = dataset[i]["img"]
            a = aug_tester(raw)
            res = finalize_detections(
                a["boxes"], a["scores"], a["labels"], a["valid"],
                a["mask_probs"], scale_wh=np.asarray([1.0, 1.0]),
                orig_wh=np.asarray([raw.shape[1], raw.shape[0]]),
            )
        else:
            sample = pipeline(dataset[i])
            out = run(
                params, jnp.asarray(sample["img"])[None],
                jnp.asarray(sample["img_wh"])[None],
            )
            res = finalize_detections(
                np.asarray(out.dets.boxes[0]), np.asarray(out.dets.scores[0]),
                np.asarray(out.dets.labels[0]), np.asarray(out.dets.valid[0]),
                np.asarray(out.mask_probs[0]),
                sample["scale_wh"], sample["orig_wh"],
            )
        gt = dataset.gt_instances(i)
        preds["masks"].append(res["masks"])
        preds["labels"].append(res["labels"])
        preds["scores"].append(res["scores"])
        gts["masks"].append(gt["masks"])
        gts["labels"].append(gt["labels"])
        gts["crowd"].append(gt.get("iscrowd", np.zeros(len(gt["labels"]), bool)))
        if verbose and (i + 1) % 50 == 0:
            print(f"eval {i + 1}/{n} ({(i + 1) / (time.time() - t0):.2f} img/s)",
                  flush=True)

    if is_coco:
        res = coco_segm_eval(
            preds["masks"], preds["labels"], preds["scores"],
            gts["masks"], gts["labels"], num_classes=num_classes,
            gt_iscrowd=gts["crowd"],
        )
        return {k: float(res[k]) for k in ("AP", "AP50", "AP75")}
    results = {}
    for thr in (0.25, 0.5, 0.75):
        mAP, aps, _ = eval_map_segm(
            preds["masks"], preds["labels"], preds["scores"],
            gts["masks"], gts["labels"], num_classes=num_classes,
            iou_thresh=thr,
        )
        results[f"mAP@{thr}"] = mAP
        if verbose:
            print(f"--- IoU {thr} ---  mAP: {mAP * 100:.1f}")
    return results
