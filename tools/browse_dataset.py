#!/usr/bin/env python
"""Visualize augmented training samples (`tools/misc/browse_dataset.py`
analog): runs the train pipeline on N samples and writes annotated pngs.

    python tools/browse_dataset.py configs/attnshift_voc12aug.py --num 8 \
        --out-dir browse
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--out-dir", default="browse_dataset")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    from PIL import Image

    from attentionshift_tpu.config import Config
    from attentionshift_tpu.data.build import build_train_dataset
    from attentionshift_tpu.data.pipeline import TrainPipeline
    from attentionshift_tpu.utils.visualize import denormalize, draw_detections

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    dataset = build_train_dataset(cfg.data.train.to_dict())
    pipeline = TrainPipeline(
        scales=[tuple(s) for s in cfg.data.train_scales],
        max_gt=int(cfg.data.max_gt), flip_ratio=float(cfg.data.flip_ratio),
    )
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(min(args.num, len(dataset))):
        out = pipeline(dataset[i], rng)
        img = denormalize(out["img"])
        pts = out["gt_points"][out["gt_valid"]]
        vis = draw_detections(img, np.zeros((0, 4)), points=pts)
        path = os.path.join(args.out_dir, f"sample_{i}.png")
        Image.fromarray(vis).save(path)
        print(path)


if __name__ == "__main__":
    main()
