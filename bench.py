"""Benchmark: attention-shift pseudo-mask generation throughput.

Measures images/sec/chip for the full pseudo-label pipeline (flagship
ViT-S backbone forward + attention rollout + Hungarian matching +
CAM->CCL candidate boxes + MIL selection + similarity refinement +
mean-shift semantic centers + mask point sampling) on the available
accelerator — the BASELINE.json headline metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md). We report against the north-star bar instead: the target
is >5x an (unpublished) reference GPU rate; we normalise by a
conservative 10 img/s/GPU estimate for the reference pseudo-label loop,
so vs_baseline = value / 10.0 and the >5x goal reads as vs_baseline > 5.
"""

from __future__ import annotations

import argparse
import json
import time

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-gt", type=int, default=20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed loop "
                         "(view with tensorboard/xprof)")
    args = ap.parse_args()

    from attentionshift_tpu.models.detector import AttnShiftDetector

    dev = jax.devices()[0]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    on_tpu = jax.devices()[0].platform != "cpu"
    model = AttnShiftDetector(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, max_gt=args.max_gt, use_remat=False,
        use_pallas_attention=on_tpu, use_pallas_ccl=on_tpu, dtype=dtype,
    )
    b, h, w, g = args.batch, args.height, args.width, args.max_gt
    rng = jax.random.PRNGKey(0)
    img = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3), jnp.float32), dev
    )
    pts = jnp.tile(
        jnp.asarray(np.random.RandomState(1).rand(1, g, 2) * [w * 0.9, h * 0.9] + 10,
                    jnp.float32), (b, 1, 1))
    lbls = jnp.tile(jnp.asarray(np.random.RandomState(2).randint(0, 20, (1, g)),
                                jnp.int32), (b, 1))
    n_valid = min(8, g)
    valid = jnp.tile(jnp.asarray([[True] * n_valid + [False] * (g - n_valid)]), (b, 1))
    img_wh = jnp.tile(jnp.asarray([[float(w), float(h)]]), (b, 1))

    params = model.init(
        {"params": rng, "sampling": rng}, img, pts, lbls, valid, img_wh,
        method=type(model).seed_pseudo_gt,
    )

    @jax.jit
    def seed(params, img, pts, lbls, valid, img_wh, key):
        return model.apply(
            params, img, pts, lbls, valid, img_wh,
            method=type(model).seed_pseudo_gt, rngs={"sampling": key},
        )

    def sync(o):
        # scalar fetch: forces the device queue to drain even on backends
        # whose block_until_ready is a no-op (the tunneled axon plugin)
        return float(jnp.sum(o["pseudo_gt_bboxes"]))

    # warmup / compile
    out = None
    for i in range(args.warmup):
        out = seed(params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(i))
        sync(out)

    import contextlib

    trace_ctx = (
        jax.profiler.trace(args.trace) if args.trace else contextlib.nullcontext()
    )
    with trace_ctx:
        t0 = time.perf_counter()
        for i in range(args.steps):
            out = seed(params, img, pts, lbls, valid, img_wh, jax.random.PRNGKey(100 + i))
        sync(out)
        dt = time.perf_counter() - t0

    imgs_per_sec = args.steps * b / dt
    ref_gpu_estimate = 10.0  # img/s; no published reference throughput
    print(json.dumps({
        "metric": "pseudomask_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / ref_gpu_estimate, 3),
    }))


if __name__ == "__main__":
    main()
