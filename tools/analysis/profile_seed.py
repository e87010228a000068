"""Stage-level timing of the pseudo-label pipeline on the local accelerator.

Times (1) backbone forward, (2) Stage A (rollout + Hungarian + CAM->CCL->
boxes + MIL), (3) the full seed_pseudo_gt, at the benchmark shape, and
prints a per-stage breakdown. The gap (3)-(2) is Stages B+C.
"""

from __future__ import annotations

import argparse
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
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--max-gt", type=int, default=20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from attentionshift_tpu.models.detector import AttnShiftDetector

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = AttnShiftDetector(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, max_gt=args.max_gt, use_remat=False,
        use_pallas_attention=on_tpu, use_pallas_ccl=on_tpu, dtype=dtype,
        pad_tokens_to=128,  # match bench.py's token-axis padding
    )
    b, h, w, g = 1, args.height, args.width, args.max_gt
    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.RandomState(0).randn(b, h, w, 3), jnp.float32)
    pts = jnp.asarray(
        np.random.RandomState(1).rand(b, g, 2) * [w * 0.9, h * 0.9] + 10,
        jnp.float32,
    )
    lbls = jnp.asarray(np.random.RandomState(2).randint(0, 20, (b, g)), jnp.int32)
    valid = jnp.asarray([[True] * 8 + [False] * (g - 8)])
    img_wh = jnp.asarray([[float(w), float(h)]])

    # jitted init: eager init dispatches thousands of small ops through
    # the tunneled backend (~1.2 ms RTT each); jitted it is one
    # cacheable executable (see bench.py)
    params = jax.jit(
        lambda r: model.init(
            {"params": r, "sampling": r}, img, pts, lbls, valid, img_wh,
            method=type(model).seed_pseudo_gt,
        )
    )(rng)
    jax.block_until_ready(params)

    def sync(out):
        # scalar fetch drains the queue even where block_until_ready no-ops
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def bench(fn, *fargs, name=""):
        out = fn(*fargs)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*fargs)
        sync(out)
        dt = (time.perf_counter() - t0) / args.steps * 1000
        print(f"{name:<28s} {dt:8.2f} ms")
        return dt

    @jax.jit
    def backbone_only(p, im):
        return model.apply(p, im, method=type(model).backbone_forward)

    def _stage_a(mod, im, pts_, lbls_, valid_, wh):
        out, roi_map, (hp, wp) = mod._extract(im, deterministic=True)
        rng_ = mod.make_rng("sampling")
        # run _seed but only up to pseudo boxes: masks_and_centers is
        # data-dependent on its outputs, so jit DCE drops Stages B+C when
        # we only return the Stage-A products
        assigned, pseudo_boxes, best_idx, mil_loss, _pl = mod._seed(
            rng_, out, roi_map, (hp, wp), (h, w), pts_, lbls_, valid_, wh,
        )
        return pseudo_boxes, best_idx, mil_loss

    @jax.jit
    def stage_a(p, im, pts_, lbls_, valid_, wh, key):
        return model.apply(
            p, im, pts_, lbls_, valid_, wh, method=_stage_a,
            rngs={"sampling": key},
        )

    @jax.jit
    def seed_full(p, im, pts_, lbls_, valid_, wh, key):
        return model.apply(
            p, im, pts_, lbls_, valid_, wh,
            method=type(model).seed_pseudo_gt, rngs={"sampling": key},
        )

    t_bb = bench(backbone_only, params, img, name="backbone forward")
    t_a = bench(
        stage_a, params, img, pts, lbls, valid, img_wh,
        jax.random.PRNGKey(4), name="backbone + stage A",
    )
    t_full = bench(
        seed_full, params, img, pts, lbls, valid, img_wh,
        jax.random.PRNGKey(5), name="full seed_pseudo_gt",
    )
    print(f"{'stage A (rollout/CCL/MIL)':<28s} {t_a - t_bb:8.2f} ms")
    print(f"{'stages B+C (refine/shift)':<28s} {t_full - t_a:8.2f} ms")


if __name__ == "__main__":
    main()
