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


def make_sample(rng, i, corpus: str = "discs"):
    """Blob image + point supervision + TRUE masks/boxes for scoring.

    ``corpus``: ``discs`` (uniform circles, the historical fixture
    recipe) or ``lobes`` (two overlapping differently-toned lobes per
    instance — gives the mean-shift engine real part structure, so
    trained features can pass the 0.85 fg-occupancy prototype filter;
    VERDICT r4 #5)."""
    img = rng.randn(H, W, 3).astype(np.float32) * 0.1
    yy, xx = np.mgrid[:H, :W]
    if corpus == "lobes-tex":
        # textured background (low-frequency color fields): forces the
        # backbone to learn locally-discriminative embeddings, which is
        # what the 0.85 fg-occupancy prototype filter needs — on the
        # flat corpora the prototypes' >0.8-similarity regions spread
        # over the (self-similar) background and every prototype is
        # rejected (round-5 probe: occupancy ~0.1 flat, ~0.7 textured
        # with an OOD checkpoint)
        for c in range(3):
            f1, f2 = rng.rand(2) * 0.02 + 0.005
            img[..., c] += 0.6 * np.sin(2 * np.pi * (f1 * xx + f2 * yy + rng.rand()))
    pts, lbls, masks, boxes = [], [], [], []
    for j in range(2):
        cx, cy = rng.randint(100, 412), rng.randint(100, 412)
        r = rng.randint(40, 90)
        blob = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
        color = np.zeros(3)
        color[(i + j) % 3] = 2.5
        img[blob] += color
        if corpus in ("lobes", "lobes-tex"):
            dx = int(r * 0.8)
            lobe2 = ((xx - cx - dx) ** 2 + (yy - cy) ** 2) < (r * 0.7) ** 2
            img[lobe2] += np.roll(color, 1) * 0.8  # distinct part tone
            if corpus == "lobes-tex":
                # strong high-frequency texture, distinct per lobe
                tex = np.sin(2 * np.pi * 0.08 * (
                    xx * np.cos(rng.rand() * 3) + yy * np.sin(rng.rand() * 3)))
                img[blob] += (1.2 * tex[..., None] * color[None, :])[blob]
                tex2 = np.sin(2 * np.pi * 0.15 * (xx + yy))
                img[lobe2] += (0.9 * tex2[..., None] * np.roll(color, 1)[None, :])[lobe2]
            blob = blob | lobe2
        pts.append([cx, cy])
        lbls.append((i + j) % 3)
        masks.append(blob)
        bx = np.where(blob.any(0))[0]
        by = np.where(blob.any(1))[0]
        boxes.append([bx.min(), by.min(), bx.max() + 1, by.max() + 1])
    g_pts = np.zeros((G, 2), np.float32); g_pts[:2] = pts
    g_lbl = np.zeros((G,), np.int32); g_lbl[:2] = lbls
    g_val = np.zeros((G,), bool); g_val[:2] = True
    return (img, g_pts, g_lbl, g_val, np.stack(masks),
            np.asarray(boxes, np.float32))


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
    ap.add_argument("--train-images", type=int, default=8,
                    help="size of the synthetic training corpus")
    ap.add_argument("--corpus", default="discs", choices=["discs", "lobes", "lobes-tex"],
                    help="instance shape: uniform discs (historical) or "
                         "two-lobed part-structured instances")
    ap.add_argument("--det-eval", action="store_true",
                    help="at each milestone ALSO run the real detection "
                         "chain (simple_test -> mask paste -> "
                         "eval_map_segm) on the held-out corpus and "
                         "report det mask mAP@0.25/0.5/0.75 (VERDICT r4 "
                         "#1: the flagship's own detector must score)")
    ap.add_argument("--curve-out", default=None, metavar="JSONL",
                    help="append one JSON line per milestone to this file "
                         "(the committed learning-curve artifact)")
    ap.add_argument("--save-ckpt", default=None, metavar="DIR",
                    help="save the trained params (orbax, params-only) — "
                         "the fixture for `bench.py --ckpt` (throughput on "
                         "realistic attention instead of random init)")
    ap.add_argument("--save-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="parameter dtype for --save-ckpt; bfloat16 halves "
                         "the committed-fixture size (the fidelity study "
                         "feeds BOTH stride paths the same weights, so "
                         "fixture precision cancels out of the drift)")
    ap.add_argument("--dagger", type=int, default=0, metavar="N",
                    help="after flagship training, dump pseudo labels and "
                         "retrain a standard Mask R-CNN on them for N steps "
                         "(the AttnShift-dagger loop), then score BOTH "
                         "models' actual detections held-out")
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
    train_data = [make_sample(rng, i, args.corpus)
                  for i in range(args.train_images)]
    held = [make_sample(np.random.RandomState(100 + i), i, args.corpus)
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

    def cast_f32(params):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
            params,
        )

    def score(params):
        f32 = cast_f32(params)
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

    flag_test = jax.jit(lambda p, im, w: model.apply(
        p, im, w, method=type(model).simple_test))

    def det_map(params):
        """The REAL eval chain: simple_test -> paste -> eval_map_segm."""
        from attentionshift_tpu.eval.masks import paste_masks_np
        from attentionshift_tpu.eval.mean_ap_segm import eval_map_segm

        f32 = cast_f32(params)
        pm, plb, psc, gm, glb = [], [], [], [], []
        for img, _, _, _, tmasks, _ in held:
            o = flag_test(f32, jnp.asarray(img)[None], wh)
            v = np.asarray(o.dets.valid[0])
            boxes = np.asarray(o.dets.boxes[0], np.float32)[v]
            probs = np.asarray(o.mask_probs[0], np.float32)[v]
            masks = (paste_masks_np(probs, boxes, H, W) > 0.5
                     if v.any() else np.zeros((0, H, W), bool))
            pm.append(masks)
            plb.append(np.asarray(o.dets.labels[0], np.int32)[v])
            psc.append(np.asarray(o.dets.scores[0], np.float32)[v])
            gm.append(tmasks.astype(bool))
        # gt labels: the first two (valid) slots of each sample
        glb = [np.asarray(s[2][:2], np.int32) for s in held]
        res = {}
        for thr, name in ((0.25, "mAP25"), (0.5, "mAP50"), (0.75, "mAP75")):
            mAP, _, _ = eval_map_segm(
                pm, plb, psc, gm, glb, num_classes=model.num_classes,
                iou_thresh=thr)
            res[name] = round(float(mAP), 4)
        res["n_det"] = int(sum(len(x) for x in plb))
        return res

    table = []
    t0 = time.time()
    last_loss = float("nan")
    for it in range(args.steps + 1):
        if it in milestones:
            bi, mi = score(state.params)
            row = dict(step=it, loss=round(last_loss, 2),
                       pseudo_box_iou=round(bi, 4),
                       pseudo_mask_iou=round(mi, 4))
            if args.det_eval:
                row.update(det_map(state.params))
            table.append(row)
            print(json.dumps(table[-1]), flush=True)
            if args.curve_out:
                with open(args.curve_out, "a") as f:
                    f.write(json.dumps(table[-1]) + "\n")
        if it == args.steps:
            break
        img, pts, lbl, val, _, _ = train_data[it % len(train_data)]
        batch = dict(
            img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
            gt_labels=jnp.asarray(lbl)[None], gt_valid=jnp.asarray(val)[None],
            img_wh=wh,
        )
        state, m = step_fn(state, batch, jax.random.PRNGKey(42 + it))
        if it % 50 == 0:
            last_loss = float(m["loss_total"])

    summary = dict(steps=args.steps, wall_s=round(time.time() - t0, 1),
                   table=table)

    if args.save_ckpt:
        from attentionshift_tpu.train.checkpoint import save_params

        to_save = state.params
        if args.save_dtype == "bfloat16":
            to_save = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                to_save,
            )
        path = save_params(os.path.abspath(args.save_ckpt), to_save)
        summary["ckpt"] = path
        print(f"saved trained params to {path}", flush=True)

    if args.dagger:
        summary["dagger"] = dagger_loop(
            args, model, state.params, seed, train_data, held, wh, cast_f32
        )

    print(json.dumps(summary))


def det_mask_iou(apply_fn, params, held, wh):
    """Mean per-GT best detection-mask IoU over the held-out corpus.

    Class-agnostic best-IoU over the model's ACTUAL detections (pasted
    to image frame) — localisation quality of the trained detector, as
    opposed to ``score``'s pseudo-label quality."""
    from attentionshift_tpu.eval.masks import paste_masks_np

    ious = []
    for img, _, _, _, tmasks, _ in held:
        out = apply_fn(params, jnp.asarray(img)[None], wh)
        boxes = np.asarray(out.dets.boxes[0], np.float32)
        valid = np.asarray(out.dets.valid[0])
        probs = np.asarray(out.mask_probs[0], np.float32)
        if valid.sum() == 0:
            ious += [0.0] * len(tmasks)
            continue
        pasted = paste_masks_np(probs[valid], boxes[valid], H, W) > 0.5
        for tm in tmasks:
            inter = (pasted & tm[None]).sum(axis=(1, 2))
            union = pasted.sum(axis=(1, 2)) + tm.sum() - inter
            ious.append(float((inter / np.maximum(union, 1)).max()))
    return float(np.mean(ious))


def dagger_loop(args, model, params, seed, train_data, held, wh, cast_f32):
    """AttnShift-dagger: pseudo-label dump -> Mask R-CNN retrain -> score.

    The paper's dagger rows (`figures/Perform-VOC.jpg`, 68.3->70.3 mAP25)
    retrain a standard Mask R-CNN on the stage-1 pseudo labels. Same loop
    here, in-memory on the blob corpus: the flagship's final
    ``seed_pseudo_gt`` output becomes full supervision for
    ``models/mask_rcnn.py`` (the tools/gen_pseudo_labels.py ->
    configs/mrcnn_refine_voc.py path, minus the filesystem round trip).
    """
    from attentionshift_tpu.models.mask_rcnn import MaskRCNN
    from attentionshift_tpu.train.optim import build_sgd_optimizer
    from attentionshift_tpu.train.step import make_refine_train_step

    f32 = cast_f32(params)
    G_ = train_data[0][1].shape[0]

    # ---- stage 1 output -> full pseudo supervision for the train corpus
    dumped = []
    for img, pts, lbl, val, _, _ in train_data:
        out = jax.tree.map(np.asarray, seed(
            f32, jnp.asarray(img)[None], jnp.asarray(pts)[None],
            jnp.asarray(lbl)[None], jnp.asarray(val)[None], wh,
            jax.random.PRNGKey(7),
        ))
        dumped.append(dict(
            img=img, boxes=out["pseudo_gt_bboxes"][0].astype(np.float32),
            labels=lbl, masks=out["pseudo_gt_masks"][0][:, ::4, ::4], valid=val,
        ))

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rcnn = MaskRCNN(
        num_classes=20, depths=(2, 2, 2, 2), frozen_stages=0,
        num_proposals=256, rpn_nms_pre=512, rcnn_samples=128,
        mask_sample_cap=32, test_max_per_img=8, dtype=dtype,
    )
    key = jax.random.PRNGKey(1)
    d0 = dumped[0]
    p_r = jax.jit(lambda k: rcnn.init(
        {"params": k, "sampling": k},
        jnp.zeros((B, H, W, 3), jnp.float32), jnp.asarray(d0["boxes"])[None],
        jnp.asarray(d0["labels"])[None],
        jnp.asarray(d0["masks"])[None], jnp.asarray(d0["valid"])[None], wh,
    ))(key)
    # batch-1 recipe: mmdet's lr 0.02 is for batch 16 -> linear-scaled
    tx = build_sgd_optimizer(p_r, base_lr=0.0025, steps_per_epoch=100,
                             warmup_iters=20, frozen_stages=0,
                             accumulate_steps=1)
    state_r = TrainState.create(p_r, tx)
    step_r = make_refine_train_step(rcnn, donate=False)

    last = float("nan")
    for it in range(args.dagger):
        d = dumped[it % len(dumped)]
        batch = dict(
            img=jnp.asarray(d["img"])[None],
            gt_boxes=jnp.asarray(d["boxes"])[None],
            gt_labels=jnp.asarray(d["labels"])[None],
            gt_masks=jnp.asarray(d["masks"])[None],
            gt_valid=jnp.asarray(d["valid"])[None],
            img_wh=wh,
        )
        state_r, m = step_r(state_r, batch, jax.random.PRNGKey(1000 + it))
        if it % 50 == 0:
            last = float(m["loss_total"])
            print(json.dumps(dict(dagger_step=it, loss=round(last, 2))),
                  flush=True)

    # ---- held-out DETECTION quality: flagship vs the refined Mask R-CNN
    flag_test = jax.jit(lambda p, im, w: model.apply(
        p, im, w, method=type(model).simple_test))
    rcnn_test = jax.jit(lambda p, im, w: rcnn.apply(
        p, im, w, method=MaskRCNN.simple_test))
    res = dict(
        steps=args.dagger, final_loss=round(last, 2),
        flagship_det_mask_iou=round(det_mask_iou(flag_test, f32, held, wh), 4),
        dagger_det_mask_iou=round(
            det_mask_iou(rcnn_test, cast_f32(state_r.params), held, wh), 4),
    )
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    main()
