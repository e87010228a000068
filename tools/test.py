#!/usr/bin/env python
"""Evaluation CLI (the `tools/test.py` counterpart).

Usage:
    python tools/test.py configs/attnshift_voc12aug.py work_dirs/voc/epoch_12 \
        --eval mAP_Segm

Runs single-scale inference over the VOC val split, pastes masks into
the original frames, and reports VOC07-metric mask AP at IoU
{0.25, 0.5, 0.75} (the reference's mAP_Segm protocol,
`mmdet/datasets/voc_instance.py:35-105`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("ATTNSHIFT_PLATFORM") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", default="mAP_Segm")
    p.add_argument("--limit", type=int, default=None, help="eval first N images")
    p.add_argument("--aug-test", action="store_true",
                   help="multi-scale + flip augmented inference (6 scales x2)")
    p.add_argument("--out", default=None, help="dump raw results json")
    p.add_argument("--dump-preds", default=None, metavar="PKL",
                   help="dump per-image predictions + gts for offline "
                        "re-evaluation (tools/analysis/eval_metric.py) or "
                        "inspection (tools/analysis/analyze_results.py)")
    p.add_argument("--gather-dir", default="/tmp/attnshift_eval_gather",
                   help="shared-FS dir for multi-host prediction gather")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.data.build import build_eval_dataset
    from attentionshift_tpu.data.pipeline import TestPipeline
    from attentionshift_tpu.models.detector import AttnShiftDetector


    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    refine = cfg.get("model_type", "attnshift") == "mask_rcnn"
    if refine:
        from attentionshift_tpu.models.mask_rcnn import MaskRCNN

        model = MaskRCNN(**cfg.model.to_dict())
    else:
        model = AttnShiftDetector(**cfg.model.to_dict())
    dataset = build_eval_dataset(cfg.data.val.to_dict())
    pipeline = TestPipeline(scale=tuple(cfg.data.test_scale))

    # full param template via abstract init of the TRAIN path (the
    # checkpoint contains train-only heads the test path never touches)
    rng = jax.random.PRNGKey(0)
    bh, bw = pipeline.bucket_hw
    g = int(cfg.data.max_gt)
    if refine:
        ms = int(cfg.model.get("mask_stride", 4))
        init_fn = lambda: model.init(
            {"params": rng, "sampling": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 4), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g, bh // ms, bw // ms), jnp.uint8),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )
    else:
        init_fn = lambda: model.init(
            {"params": rng, "sampling": rng, "dropout": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 2), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )
    shapes = jax.eval_shape(init_fn)
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    if args.checkpoint:
        # params-only restore: independent of the training optimizer
        # layout (accumulation steps, non-finite guard, ...)
        from attentionshift_tpu.train import restore_params

        params = restore_params(args.checkpoint)
        print(f"loaded {args.checkpoint}")

    aug_tester = None
    if args.aug_test:
        from attentionshift_tpu.eval.aug_test import AugTester

        # the reference protocol: 6 scales x flip (voc_instance_aug.py:39-53)
        scales = [(800, 1333), (600, 1333), (400, 1333),
                  (800, 1000), (600, 1000), (400, 1000)]
        aug_tester = AugTester(model, params, scales=scales, flip=True)

    from attentionshift_tpu.eval.runner import evaluate

    results = evaluate(
        model, params, dataset, test_scale=tuple(cfg.data.test_scale),
        limit=args.limit, aug_tester=aug_tester,
        num_classes=int(cfg.model.num_classes),
        process_index=jax.process_index(), process_count=jax.process_count(),
        gather_dir=args.gather_dir, dump_path=args.dump_preds,
    )
    if results is None:  # non-zero process of a multi-host eval
        return
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
