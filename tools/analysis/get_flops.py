#!/usr/bin/env python
"""FLOPs/params report (the `tools/analysis_tools/get_flops.py` analog).

Uses jax's cost analysis of the compiled inference step instead of the
reference's hook-based counter (`two_stage_point_sup.py:104-120`
forward_dummy).

    python tools/analysis/get_flops.py configs/attnshift_voc12aug.py \
        --shape 512 512
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=[512, 512])
    args = p.parse_args()

    from attentionshift_tpu.config import Config

    cfg = Config.fromfile(args.config)
    if cfg.get("model_type", "attnshift") == "mask_rcnn":
        from attentionshift_tpu.models.mask_rcnn import MaskRCNN as Model
    else:
        from attentionshift_tpu.models.detector import AttnShiftDetector as Model
    model = Model(**cfg.model.to_dict())
    h, w = args.shape
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    wh = jnp.asarray([[float(w), float(h)]])
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, img, wh, method=Model.simple_test)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    lowered = jax.jit(
        lambda p, i, s: model.apply(p, i, s, method=Model.simple_test)
    ).lower(params, img, wh)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"input shape: (1, {h}, {w}, 3)")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
