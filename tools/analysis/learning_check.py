"""End-to-end learning check: pseudo-label quality vs KNOWN GT masks.

Strengthens `tools/debug_overfit.py` (which only asserts loss decrease):
on the synthetic blob corpus the true instance masks are known, so the
pseudo-label engine's output quality is directly measurable. Trains the
flagship model and reports, at milestones, the pseudo-box IoU and
pseudo-mask IoU against the ground-truth blobs on HELD-OUT images —
demonstrating that the full TPU pipeline (attention capture -> rollout
-> CAM/CCL -> MIL -> refine -> masks) actually learns to localise, not
just that losses go down.

    python tools/analysis/learning_check.py [--steps 600] [--eval-images 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

from attentionshift_tpu.models.detector import AttnShiftDetector
from attentionshift_tpu.train import TrainState, build_optimizer, make_train_step

B, H, W, G = 1, 512, 512, 8


def make_sample(rng, i):
    """Blob image + point supervision + TRUE masks/boxes for scoring."""
    img = rng.randn(H, W, 3).astype(np.float32) * 0.1
    yy, xx = np.mgrid[:H, :W]
    pts, lbls, masks, boxes = [], [], [], []
    for j in range(2):
        cx, cy = rng.randint(100, 412), rng.randint(100, 412)
        r = rng.randint(40, 90)
        blob = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        color = np.zeros(3)
        color[(i + j) % 3] = 2.5
        img[blob] += color
        pts.append([cx, cy])
        lbls.append((i + j) % 3)
        masks.append(blob)
        boxes.append([cx - r, cy - r, cx + r, cy + r])
    g_pts = np.zeros((G, 2), np.float32); g_pts[:2] = pts
    g_lbl = np.zeros((G,), np.int32); g_lbl[:2] = lbls
    g_val = np.zeros((G,), bool); g_val[:2] = True
    return img, g_pts, g_lbl, g_val, np.stack(masks), np.asarray(boxes, np.float32)


def box_iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ar = lambda r: max(0.0, r[2] - r[0]) * max(0.0, r[3] - r[1])
    return inter / max(ar(a) + ar(b) - inter, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--milestones", type=int, nargs="*", default=None)
    ap.add_argument("--no-pallas", action="store_true",
                    help="plain-XLA attention/CCL (kernel-vs-recipe A/B)")
    ap.add_argument("--f32", action="store_true", help="float32 model")
    args = ap.parse_args()
    milestones = args.milestones or sorted(
        {0, args.steps // 8, args.steps // 2, args.steps}
    )

    model = AttnShiftDetector(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, max_gt=G, use_remat=True,
        use_pallas_attention=not args.no_pallas,
        use_pallas_ccl=not args.no_pallas,
        num_proposals=512, rpn_nms_pre=1000, rcnn_samples=256,
        mask_sample_cap=64,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    train_data = [make_sample(rng, i) for i in range(8)]
    held = [make_sample(np.random.RandomState(100 + i), i)
            for i in range(args.eval_images)]

    key = jax.random.PRNGKey(0)
    img0 = jnp.zeros((B, H, W, 3), jnp.float32)
    wh = jnp.asarray([[float(W), float(H)]])
    params = jax.jit(
        lambda k: model.init(
            {"params": k, "sampling": k, "dropout": k},
            img0, jnp.zeros((B, G, 2)), jnp.zeros((B, G), jnp.int32),
            jnp.zeros((B, G), bool), wh,
        )
    )(key)
    tx = build_optimizer(params, base_lr=1e-4, steps_per_epoch=100,
                         accumulate_steps=1, depth=12, warmup_iters=20)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, donate=False)

    seed = jax.jit(lambda p, im, pt, lb, vl, w, k: model.apply(
        p, im, pt, lb, vl, w, method=type(model).seed_pseudo_gt,
        rngs={"sampling": k},
    ))

    def score(params):
        f32 = jax.tree.map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
            params,
        )
        bious, mious = [], []
        for img, pts, lbl, val, tmasks, tboxes in held:
            out = jax.tree.map(np.asarray, seed(
                f32, jnp.asarray(img)[None], jnp.asarray(pts)[None],
                jnp.asarray(lbl)[None], jnp.asarray(val)[None], wh,
                jax.random.PRNGKey(7),
            ))
            for gi in range(2):
                bious.append(box_iou(out["pseudo_gt_bboxes"][0, gi], tboxes[gi]))
                pm = out["pseudo_gt_masks"][0, gi] > 0.5
                inter = (pm & tmasks[gi]).sum()
                union = pm.sum() + tmasks[gi].sum() - inter
                mious.append(float(inter / max(union, 1)))
        return float(np.mean(bious)), float(np.mean(mious))

    table = []
    t0 = time.time()
    last_loss = float("nan")
    for it in range(args.steps + 1):
        if it in milestones:
            bi, mi = score(state.params)
            table.append(dict(step=it, loss=round(last_loss, 2),
                              pseudo_box_iou=round(bi, 4),
                              pseudo_mask_iou=round(mi, 4)))
            print(json.dumps(table[-1]), flush=True)
        if it == args.steps:
            break
        img, pts, lbl, val, _, _ = train_data[it % 8]
        batch = dict(
            img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
            gt_labels=jnp.asarray(lbl)[None], gt_valid=jnp.asarray(val)[None],
            img_wh=wh,
        )
        state, m = step_fn(state, batch, jax.random.PRNGKey(42 + it))
        if it % 50 == 0:
            last_loss = float(m["loss_total"])

    print(json.dumps(dict(
        steps=args.steps, wall_s=round(time.time() - t0, 1), table=table,
    )))


if __name__ == "__main__":
    main()
