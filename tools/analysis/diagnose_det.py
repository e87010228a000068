"""Diagnose WHY the flagship's own detector scores 0 on the toy corpus.

Round-5 probe (VERDICT r4 weak #1): trains the flagship like
``learning_check`` and then inspects every stage of the detection chain
on held-out images — RPN proposal recall, RCNN classification accuracy,
detection-score distribution, NMS survivors, pasted-mask IoU — so the
zero can be attributed to a specific stage instead of "needs more steps".

    python tools/analysis/diagnose_det.py --steps 1500
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
from tools.analysis.learning_check import make_sample, box_iou, B, H, W, G


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval-images", type=int, default=4)
    ap.add_argument("--train-images", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    model = AttnShiftDetector(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, max_gt=G, use_remat=True,
        num_proposals=512, rpn_nms_pre=1000, rcnn_samples=256,
        mask_sample_cap=64, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    train_data = [make_sample(rng, i) for i in range(args.train_images)]
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
    tx = build_optimizer(params, base_lr=args.lr, steps_per_epoch=100,
                         accumulate_steps=1, depth=12, warmup_iters=20)
    state = TrainState.create(params, tx)
    step_fn = make_train_step(model, donate=False)

    t0 = time.time()
    for it in range(args.steps):
        img, pts, lbl, val, _, _ = train_data[it % len(train_data)]
        batch = dict(
            img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
            gt_labels=jnp.asarray(lbl)[None], gt_valid=jnp.asarray(val)[None],
            img_wh=wh,
        )
        state, m = step_fn(state, batch, jax.random.PRNGKey(42 + it))
        if it % 250 == 0 or it == args.steps - 1:
            print(json.dumps({k: round(float(v), 3) for k, v in
                              sorted(m.items())} | dict(step=it)), flush=True)

    print(f"train wall {time.time() - t0:.0f}s", flush=True)
    f32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        state.params)

    # ---- stage-by-stage probes on held-out images
    rpn_fn = jax.jit(lambda p, im: model.apply(p, im, method=type(model).rpn_test))
    test_fn = jax.jit(lambda p, im, w: model.apply(
        p, im, w, method=type(model).simple_test))
    roi_fn = jax.jit(lambda p, im, r, w: model.apply(
        p, im, r, w, method=type(model).roi_test))

    from attentionshift_tpu.eval.masks import paste_masks_np

    for n, (img, pts, lbl, val, tmasks, tboxes) in enumerate(held):
        imj = jnp.asarray(img)[None]
        props = rpn_fn(f32, imj)
        pb = np.asarray(props.boxes[0])
        pv = np.asarray(props.valid[0])
        # RPN recall: best proposal IoU per true box
        rec = [max(box_iou(p, tb) for p in pb[pv]) if pv.any() else 0.0
               for tb in tboxes]
        # RCNN on the TRUE boxes: does the head classify a perfect box?
        r = model.num_proposals
        rois = np.zeros((1, r, 4), np.float32)
        rois[0, :2] = tboxes
        rois[0, 2:] = pb[:r - 2]
        sc, dec = roi_fn(f32, imj, jnp.asarray(rois), wh)
        sc = np.asarray(sc[0])  # (R, C+1)
        out = test_fn(f32, imj, wh)
        dsc = np.asarray(out.dets.scores[0])
        dval = np.asarray(out.dets.valid[0])
        dbox = np.asarray(out.dets.boxes[0])
        diou = [max((box_iou(bb, tb) for bb in dbox[dval]), default=0.0)
                for tb in tboxes]
        mask_iou = 0.0
        if dval.any():
            probs = np.asarray(out.mask_probs[0], np.float32)
            pasted = paste_masks_np(probs[dval], dbox[dval], H, W) > 0.5
            ious = []
            for tm in tmasks:
                inter = (pasted & tm[None]).sum(axis=(1, 2))
                union = pasted.sum(axis=(1, 2)) + tm.sum() - inter
                ious.append(float((inter / np.maximum(union, 1)).max()))
            mask_iou = float(np.mean(ious))
        print(json.dumps(dict(
            img=n, true_labels=[int(x) for x in lbl[:2]],
            rpn_recall=[round(float(x), 3) for x in rec],
            # columns: P(true class), P(best fg class), argmax, P(bg) on the TRUE boxes
            truebox_p_true=[round(float(sc[i, lbl[i]]), 4) for i in range(2)],
            truebox_p_maxfg=[round(float(sc[i, :20].max()), 4) for i in range(2)],
            truebox_argmax=[int(sc[i].argmax()) for i in range(2)],
            truebox_p_bg=[round(float(sc[i, 20]), 4) for i in range(2)],
            n_det=int(dval.sum()),
            det_scores_top5=[round(float(s), 4) for s in np.sort(dsc[dval])[::-1][:5]],
            det_best_box_iou=[round(float(x), 3) for x in diou],
            det_mask_iou=round(mask_iou, 4),
        )), flush=True)


if __name__ == "__main__":
    main()
