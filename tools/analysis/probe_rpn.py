"""Deep RPN probe (round 5): WHY does the trained flagship RPN recall 0?

Trains briefly on the blob corpus, then dissects the RPN on one train
and one held-out image: per-level objectness stats, scores at anchors
overlapping the true boxes, assignment/sampling counts inside rpn_loss,
and the proposal set (validity, score range, best IoU vs truth).

    python tools/analysis/probe_rpn.py --steps 1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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

from attentionshift_tpu.core.anchors import grid_anchors, grid_anchors_per_level
from attentionshift_tpu.core.assign import max_iou_assign, random_sample
from attentionshift_tpu.models.detector import AttnShiftDetector
from attentionshift_tpu.models.rpn import rpn_proposals
from attentionshift_tpu.train import TrainState, build_optimizer, make_train_step
from tools.analysis.learning_check import make_sample, box_iou, B, H, W, G


def iou_matrix(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ar = lambda r: np.clip(r[:, 2] - r[:, 0], 0, None) * np.clip(r[:, 3] - r[:, 1], 0, None)
    return inter / np.maximum(ar(a)[:, None] + ar(b)[None] - inter, 1e-6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--save-ckpt", default=None, metavar="DIR")
    ap.add_argument("--ckpt", default=None, metavar="DIR",
                    help="skip training; probe these saved params")
    args = ap.parse_args()

    model = AttnShiftDetector(
        num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
        point_tokens=100, cam_layer=7, max_gt=G, use_remat=True,
        num_proposals=512, rpn_nms_pre=1000, rcnn_samples=256,
        mask_sample_cap=64, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    train_data = [make_sample(rng, i) for i in range(8)]
    held = make_sample(np.random.RandomState(100), 0)

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
    if args.ckpt:
        from attentionshift_tpu.train.checkpoint import restore_params

        trained = restore_params(os.path.abspath(args.ckpt))
    else:
        state = TrainState.create(params, tx)
        step_fn = make_train_step(model, donate=False)
        for it in range(args.steps):
            img, pts, lbl, val, _, _ = train_data[it % len(train_data)]
            batch = dict(
                img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
                gt_labels=jnp.asarray(lbl)[None],
                gt_valid=jnp.asarray(val)[None], img_wh=wh,
            )
            state, m = step_fn(state, batch, jax.random.PRNGKey(42 + it))
        print(json.dumps({k: round(float(v), 4) for k, v in sorted(m.items())}),
              flush=True)
        trained = state.params
        if args.save_ckpt:
            from attentionshift_tpu.train.checkpoint import save_params

            print("saved", save_params(os.path.abspath(args.save_ckpt), trained))

    f32 = jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        trained)

    # raw RPN maps + the detector's own seed output on each probe image
    def rpn_raw(p, im):
        out, roi_map, hw = model.apply(
            p, im, method=type(model).backbone_forward), None, None
        return out

    bb_fn = jax.jit(lambda p, im: model.apply(
        p, im, method=type(model).backbone_forward))
    seed_fn = jax.jit(lambda p, im, pt, lb, vl, w, k: model.apply(
        p, im, pt, lb, vl, w, method=type(model).seed_pseudo_gt,
        rngs={"sampling": k}))

    from attentionshift_tpu.models.detector import AttnShiftDetector as AD

    # need neck + rpn head applied to backbone out: use rpn_test for the
    # proposals and a small custom apply for the raw maps
    def raw_maps(p, im):
        def fn(mdl):
            out, _, _ = mdl._extract(im)
            feats = mdl.neck(out["feature"])
            cls_scores, bbox_preds = mdl.rpn_head(feats)
            return [c for c in cls_scores], [r for r in bbox_preds]
        return model.apply(p, method=fn)

    raw_fn = jax.jit(raw_maps)
    prop_fn = jax.jit(lambda p, im: model.apply(
        p, im, method=type(model).rpn_test))

    for tag, (img, pts, lbl, val, tmasks, tboxes) in (
        ("train0", train_data[0]), ("held0", held),
    ):
        imj = jnp.asarray(img)[None]
        cls_scores, bbox_preds = raw_fn(f32, imj)
        fsizes = [c.shape[1:3] for c in cls_scores]
        rep = dict(tag=tag)
        # per-level objectness stats
        lvl_stats = []
        for c in cls_scores:
            s = jax.nn.sigmoid(np.asarray(c, np.float32)).ravel()
            lvl_stats.append(dict(
                max=round(float(s.max()), 4), mean=round(float(s.mean()), 5),
                frac_gt_05=round(float((s > 0.5).mean()), 5)))
        rep["objectness_per_level"] = lvl_stats

        # scores of anchors overlapping the TRUE boxes
        anchors = np.asarray(grid_anchors([tuple(s) for s in fsizes]))
        flat = np.concatenate([
            jax.nn.sigmoid(np.asarray(c, np.float32)).reshape(-1)
            for c in cls_scores])
        ious = iou_matrix(anchors, np.asarray(tboxes, np.float32))
        near = (ious.max(1) > 0.5)
        rep["n_anchors_iou50_true"] = int(near.sum())
        if near.any():
            rep["score_at_true_anchors"] = dict(
                max=round(float(flat[near].max()), 4),
                mean=round(float(flat[near].mean()), 4))
        rep["score_elsewhere_max"] = round(float(flat[~near].max()), 4)

        # rpn_proposals INTERNALS: reproduce the candidate set host-side
        ancs = grid_anchors_per_level([tuple(s) for s in fsizes])
        cand_scores, cand_boxes = [], []
        for c, r, anc in zip(cls_scores, bbox_preds, ancs):
            n_l = int(np.prod(c.shape[1:]))
            s_l = jax.nn.sigmoid(np.asarray(c, np.float32).reshape(n_l))
            d_l = np.asarray(r, np.float32).reshape(n_l, 4)
            k = min(1000, n_l)
            ti = np.argsort(-s_l)[:k]
            from attentionshift_tpu.core.boxes import delta2bbox as d2b
            bx = np.asarray(d2b(jnp.asarray(np.asarray(anc)[ti]),
                                jnp.asarray(d_l[ti]), max_shape=(H, W)))
            cand_scores.append(s_l[ti]); cand_boxes.append(bx)
        cb = np.concatenate(cand_boxes); cs = np.concatenate(cand_scores)
        okc = (cb[:, 2] - cb[:, 0] > 0) & (cb[:, 3] - cb[:, 1] > 0)
        rep["cand_n"] = int(cb.shape[0])
        rep["cand_ok_frac"] = round(float(okc.mean()), 4)
        rep["cand_nan_scores"] = int(np.isnan(cs).sum())
        rep["cand_nan_boxes"] = int(np.isnan(cb).sum())
        rep["cand_degenerate_examples"] = [
            [round(float(x), 1) for x in b] for b in cb[~okc][:3]]

        # the proposals the detector actually uses
        props = prop_fn(f32, imj)
        pb = np.asarray(props.boxes[0]); pv = np.asarray(props.valid[0])
        ps = np.asarray(props.scores[0])
        rep["n_valid_props"] = int(pv.sum())
        if pv.any():
            pious = iou_matrix(pb[pv], np.asarray(tboxes, np.float32))
            rep["prop_best_iou"] = [round(float(x), 3) for x in pious.max(0)]
            rep["prop_score_top5"] = [round(float(s), 4)
                                      for s in np.sort(ps[pv])[::-1][:5]]

        # what the RPN is TRAINED on: the pseudo boxes for this image
        seed = jax.tree.map(np.asarray, seed_fn(
            f32, imj, jnp.asarray(pts)[None], jnp.asarray(lbl)[None],
            jnp.asarray(val)[None], wh, jax.random.PRNGKey(7)))
        psb = seed["pseudo_gt_bboxes"][0][:2]
        rep["pseudo_boxes"] = [[round(float(x), 1) for x in b] for b in psb]
        rep["pseudo_vs_true_iou"] = [
            round(float(box_iou(psb[i], tboxes[i])), 3) for i in range(2)]

        # assignment internals on the pseudo boxes (what rpn_loss sees)
        gts = jnp.asarray(psb, jnp.float32)
        gv = jnp.asarray([True, True])
        assign = max_iou_assign(
            jnp.asarray(anchors), gts, jnp.zeros((2,), jnp.int32), gv,
            0.7, 0.3, 0.3, match_low_quality=True)
        ag = np.asarray(assign.assigned_gt)
        rep["rpn_train_n_pos"] = int((ag > 0).sum())
        rep["rpn_train_n_neg"] = int((ag == 0).sum())
        samp = random_sample(jax.random.PRNGKey(0), assign.assigned_gt, 256, 0.5)
        rep["rpn_train_sampled_pos"] = int(np.asarray(samp.pos_mask).sum())
        print(json.dumps(rep), flush=True)


if __name__ == "__main__":
    main()
