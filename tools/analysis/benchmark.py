"""End-to-end inference FPS harness.

Rebuild of the reference's ``tools/analysis_tools/benchmark.py``:
measures ``simple_test`` (backbone -> RPN -> box head -> NMS -> mask
head) latency/FPS on the local accelerator at a fixed test shape, with
warmup and jit-compiled steady state.

Usage:
    python tools/analysis/benchmark.py [config] [--height 608 --width 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default=None)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from attentionshift_tpu.models.detector import AttnShiftDetector

    kw = dict(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, use_remat=False,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        use_pallas_attention=jax.devices()[0].platform != "cpu",
    )
    if args.config:
        from attentionshift_tpu.config import Config

        cfg = Config.fromfile(args.config)
        m = cfg.model.to_dict()
        m.pop("use_remat", None)
        kw.update(m)
        kw["use_remat"] = False
    model = AttnShiftDetector(**kw)

    b, h, w = args.batch, args.height, args.width
    img = jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3), jnp.float32)
    img_wh = jnp.tile(jnp.asarray([[float(w), float(h)]]), (b, 1))
    params = model.init(
        jax.random.PRNGKey(0), img, img_wh, method=type(model).simple_test
    )

    @jax.jit
    def run(p, im, wh):
        return model.apply(p, im, wh, method=type(model).simple_test)

    def sync(o):
        # scalar fetch drains the queue even where block_until_ready no-ops
        return float(jnp.sum(o.dets.boxes))

    out = None
    for _ in range(args.warmup):
        out = run(params, img, img_wh)
        sync(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = run(params, img, img_wh)
    sync(out)
    dt = time.perf_counter() - t0
    fps = args.steps * b / dt
    print(json.dumps({
        "metric": "inference_fps",
        "value": round(fps, 3),
        "unit": "img/s",
        "latency_ms": round(dt / args.steps * 1000 / b, 2),
        "shape": [b, h, w],
    }))


if __name__ == "__main__":
    main()
