#!/usr/bin/env python
"""Dump pseudo boxes/masks for self-training refinement (AttnShift-dagger).

Runs a trained point-supervised model's ``seed_pseudo_gt`` over the
training split and writes a COCO-style instance json (bbox xywh +
compressed-RLE segmentation at original image size) that
``data.refine.InstanceCocoDataset`` / ``configs/mrcnn_refine_voc.py``
consume to retrain a standard Mask R-CNN.

Reference provenance: the paper's dagger rows retrain Mask R-CNN on the
stage-1 pseudo labels (`figures/Perform-VOC.jpg`); upstream has no dump
tool — pseudo GT only ever exists inside the train step
(`stdroi_point_deform_attn_reppoints.py:2209`) — so this CLI is the
missing bridge.

Usage:
    python tools/gen_pseudo_labels.py configs/attnshift_voc12aug.py \
        work_dirs/voc/epoch_12 --out work_dirs/voc/pseudo_train.json
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
from PIL import Image


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--scale", type=int, nargs=2, default=(800, 1333))
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.data.build import build_train_dataset
    from attentionshift_tpu.data.pipeline import IMAGENET_MEAN, IMAGENET_STD, _pad_to, _resize_keep_ratio
    from attentionshift_tpu.models.detector import AttnShiftDetector
    from attentionshift_tpu.native import rle_encode, rle_to_string


    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    model = AttnShiftDetector(**cfg.model.to_dict())
    dataset = build_train_dataset(cfg.data.train.to_dict())
    if hasattr(dataset, "repeat"):
        dataset.repeat = 1  # one pass over the unique images

    g = int(cfg.data.max_gt)
    sh, lo = args.scale
    pad32 = lambda v: (v + 31) // 32 * 32
    bh, bw = pad32(sh), pad32(lo)

    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": rng, "sampling": rng, "dropout": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 2), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    if args.checkpoint:
        from attentionshift_tpu.train import restore_params

        params = restore_params(args.checkpoint)
        print(f"loaded {args.checkpoint}")

    @jax.jit
    def seed(p, img, pts, lbls, valid, wh, key):
        return model.apply(
            p, img, pts, lbls, valid, wh,
            method=AttnShiftDetector.seed_pseudo_gt, rngs={"sampling": key},
        )

    images, annotations = [], []
    ann_id = 1
    n = len(dataset)
    if args.limit:
        n = min(n, args.limit)
    t0 = time.time()
    for i in range(n):
        s = dataset[i]
        raw = s["img"]
        oh, ow = raw.shape[:2]
        img, wf, hf = _resize_keep_ratio(raw, (sh, lo))
        h, w = img.shape[:2]
        if w < h:  # portrait: swapped static bucket
            ph, pw = bw, bh
        else:
            ph, pw = bh, bw
        norm = (img.astype(np.float32) - IMAGENET_MEAN) / IMAGENET_STD
        norm = _pad_to(norm, ph, pw)

        pts = np.zeros((g, 2), np.float32)
        lbl = np.zeros((g,), np.int32)
        val = np.zeros((g,), bool)
        k = min(len(s["labels"]), g)
        pts[:k] = s["points"][:k] * [wf, hf]
        lbl[:k] = s["labels"][:k]
        val[:k] = True

        out = seed(
            params, norm[None], pts[None], lbl[None], val[None],
            np.asarray([[float(w), float(h)]], np.float32),
            jax.random.PRNGKey(i),
        )
        boxes = np.asarray(out["pseudo_gt_bboxes"][0])  # (G, 4) in resized frame
        masks = np.asarray(out["pseudo_gt_masks"][0])  # (G, ph, pw) uint8

        images.append(dict(id=int(i), file_name=os.path.basename(
            getattr(dataset.samples[i % len(dataset.samples)], "img_path", str(i))
        ), width=int(ow), height=int(oh)))
        for j in range(k):
            x1, y1, x2, y2 = boxes[j] / [wf, hf, wf, hf]
            x1, x2 = np.clip([x1, x2], 0, ow)
            y1, y2 = np.clip([y1, y2], 0, oh)
            if x2 <= x1 or y2 <= y1:
                continue
            m = Image.fromarray(masks[j, :h, :w] * 255)
            m = np.asarray(m.resize((ow, oh), Image.BILINEAR)) > 127
            rle = rle_encode(np.asarray(m, np.uint8))
            annotations.append(dict(
                id=ann_id, image_id=int(i),
                category_id=int(lbl[j]) + 1,
                bbox=[float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                area=float(m.sum()),
                segmentation=dict(
                    size=[int(oh), int(ow)],
                    counts=rle_to_string(rle).decode("ascii"),
                ),
                iscrowd=0, score=1.0,
            ))
            ann_id += 1
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{n} images, {ann_id - 1} anns, "
                  f"{(time.time() - t0) / (i + 1):.2f}s/img")

    classes = getattr(dataset, "classes", None) or [
        f"class_{c}" for c in range(int(cfg.model.num_classes))
    ]
    coco = dict(
        images=images,
        annotations=annotations,
        categories=[dict(id=c + 1, name=name) for c, name in enumerate(classes)],
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {args.out}: {len(images)} images, {len(annotations)} annotations")


if __name__ == "__main__":
    main()
