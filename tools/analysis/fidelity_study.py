"""Fast-path vs exact-path fidelity study for the pseudo-label engine.

The TPU defaults approximate three reference semantics
(`models/detector.py:85-93`, `ops/roi_align.py:13-15`):

- ``cam_stride=8``   — CAM threshold/CCL/box extraction on a stride-8
  grid instead of the reference's full-resolution CAM
  (`stdroi_point_deform_attn_reppoints.py:2275`, bilinear x16 upsample);
- ``seed_map_stride=4`` — Stage-B/C similarity maps at stride 4 instead
  of full resolution;
- RoIAlign ``sampling_ratio=2`` fixed instead of mmcv's adaptive
  ``sampling_ratio=0``.

Each has an exact fallback (stride 1 / high sampling ratio). This script
quantifies the drift on REALISTIC inputs: it first trains the flagship
model for ``--train-steps`` steps on the synthetic blob dataset (same
recipe as `tools/debug_overfit.py`) so the attention maps are
structured, then runs three experiments:

1. **end-to-end**: ``seed_pseudo_gt`` under both configs, each with its
   own seed-point draws — total pipeline variance (stride + stochastic
   seed sampling + MIL divergence).
2. **noise floor**: the EXACT config twice with different PRNG keys —
   how much of (1) is sampling stochasticity alone.
3. **isolated stride**: Stage A boxes (same rollout rows, cam_stride 8
   vs 1) and Stages B+C (same MIL choice, same boxes, same full-res
   seed points via ``points_override``; only ``map_stride`` differs) —
   the *deterministic* cost of the stride approximations, which is what
   gates the defaults.

Results are written to FIDELITY.md (checked in) and printed as JSON.

    python tools/analysis/fidelity_study.py [--train-steps 60] [--eval-images 8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from attentionshift_tpu.models.detector import AttnShiftDetector
from attentionshift_tpu.train import TrainState, build_optimizer, make_train_step

B, H, W, G = 1, 512, 512, 8

BASE = dict(
    num_classes=20, embed_dim=384, depth=12, num_heads=6, img_size=224,
    point_tokens=100, cam_layer=7, max_gt=G, use_remat=True,
    num_proposals=512, rpn_nms_pre=1000, rcnn_samples=256, mask_sample_cap=64,
)

# fast = shipped defaults; exact = stride-1 reference semantics with the
# CCL iteration budget scaled to cover full-res propagation distances
FAST = dict(cam_stride=16, seed_map_stride=4, ccl_iters=64)  # shipped defaults (r5)
EXACT = dict(cam_stride=1, seed_map_stride=1, ccl_iters=256)


def make_sample(rng, i, h=None, w=None):
    h = h or H
    w = w or W
    img = rng.randn(h, w, 3).astype(np.float32) * 0.1
    pts, lbls = [], []
    yy, xx = np.mgrid[:h, :w]
    for j in range(2):
        cx, cy = rng.randint(100, w - 100), rng.randint(100, h - 100)
        r = rng.randint(40, 90)
        # two-lobed instance: overlapping discs with distinct tones give
        # the mean-shift engine actual part structure to find (uniform
        # discs collapse to a single prototype -> no semantic centers)
        dx = int(r * 0.8)
        lobe_a = ((xx - cx + dx) ** 2 + (yy - cy) ** 2) < r * r
        lobe_b = ((xx - cx - dx) ** 2 + (yy - cy) ** 2) < (0.8 * r) ** 2
        color = np.zeros(3)
        color[(i + j) % 3] = 2.5
        img[lobe_a] += color
        img[lobe_b] += np.roll(color, 1) * 0.8 + color * 0.4
        pts.append([cx, cy])
        lbls.append((i + j) % 3)
    g_pts = np.zeros((G, 2), np.float32); g_pts[:2] = pts
    g_lbl = np.zeros((G,), np.int32); g_lbl[:2] = lbls
    g_val = np.zeros((G,), bool); g_val[:2] = True
    return img, g_pts, g_lbl, g_val


def train_params(steps: int, n_images: int = 8):
    """Partially train the flagship model so attention is structured."""
    model = AttnShiftDetector(
        **BASE, **FAST, use_pallas_attention=True, use_pallas_ccl=True,
        dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    data = [make_sample(rng, i) for i in range(n_images)]
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
                         accumulate_steps=1, depth=12, warmup_iters=10)
    state = TrainState.create(params, tx)
    step = make_train_step(model, donate=False)
    t0 = time.time()
    for it in range(steps):
        img, pts, lbl, val = data[it % len(data)]
        batch = dict(img=jnp.asarray(img)[None], gt_points=jnp.asarray(pts)[None],
                     gt_labels=jnp.asarray(lbl)[None], gt_valid=jnp.asarray(val)[None],
                     img_wh=wh)
        state, m = step(state, batch, jax.random.PRNGKey(42 + it))
    jax.block_until_ready(m)
    print(f"trained {steps} steps in {time.time()-t0:.0f}s "
          f"(loss_total {float(m['loss_total']):.2f})", flush=True)
    return state.params


def seed_fn(overrides, method=AttnShiftDetector.seed_pseudo_gt):
    model = AttnShiftDetector(**BASE, **overrides, dtype=jnp.float32)

    @jax.jit
    def run(params, img, pts, lbl, val, wh, key):
        return model.apply(
            params, img, pts, lbl, val, wh, method=method,
            rngs={"sampling": key},
        )

    return run


def box_iou(a, b):
    x1 = np.maximum(a[0], b[0]); y1 = np.maximum(a[1], b[1])
    x2 = np.minimum(a[2], b[2]); y2 = np.minimum(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    ar_a = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
    ar_b = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
    return inter / max(ar_a + ar_b - inter, 1e-6)


def center_drift(ca, va, cb, vb):
    """Greedy nearest matching of valid semantic centers, px distances."""
    ca, cb = ca[va], cb[vb]
    if len(ca) == 0 or len(cb) == 0:
        return []
    d = np.linalg.norm(ca[:, None] - cb[None], axis=-1)
    out = []
    for _ in range(min(len(ca), len(cb))):
        i, j = np.unravel_index(np.argmin(d), d.shape)
        out.append(float(d[i, j]))
        d[i, :] = 1e9; d[:, j] = 1e9
    return out


def pct(v, qs=(50, 90, 100)):
    v = np.asarray(v, np.float64)
    if v.size == 0:
        return {f"p{q}": None for q in qs}
    return {f"p{q}": round(float(np.percentile(v, q)), 4) for q in qs}


class Acc:
    """Per-instance comparison accumulator between two seed outputs."""

    def __init__(self):
        self.iou, self.miou, self.drift, self.corr, self.agree = [], [], [], [], []
        self.nctr_a, self.nctr_b = [], []

    def add(self, ra, rb, val):
        for gi in range(G):
            if not val[gi]:
                continue
            self.nctr_a.append(int(ra["semantic_centers_valid"][0, gi].sum()))
            self.nctr_b.append(int(rb["semantic_centers_valid"][0, gi].sum()))
            self.iou.append(box_iou(ra["pseudo_gt_bboxes"][0, gi],
                                    rb["pseudo_gt_bboxes"][0, gi]))
            ma = ra["pseudo_gt_masks"][0, gi] > 0.5
            mb = rb["pseudo_gt_masks"][0, gi] > 0.5
            denom = np.maximum((ma | mb).sum(), 1)
            self.miou.append(float((ma & mb).sum() / denom))
            self.agree.append(
                float(ra["best_attn_idx"][0, gi] == rb["best_attn_idx"][0, gi]))
            self.drift += center_drift(
                ra["semantic_centers"][0, gi], ra["semantic_centers_valid"][0, gi],
                rb["semantic_centers"][0, gi], rb["semantic_centers_valid"][0, gi],
            )
            a = ra["map_cos_fg"][0, gi]
            bm = rb["map_cos_fg"][0, gi]
            s = int(round(bm.shape[0] / a.shape[0]))
            if s > 1:
                bm = bm[::s, ::s]
            a, bm = a.ravel(), bm.ravel()[: a.size]
            if a.std() > 1e-6 and bm.std() > 1e-6:
                self.corr.append(float(np.corrcoef(a, bm)[0, 1]))

    def report(self):
        return dict(
            pseudo_box_iou=pct(self.iou, (10, 50, 90)),
            pseudo_mask_iou=pct(self.miou, (10, 50, 90)),
            mil_layer_agreement=(round(float(np.mean(self.agree)), 4)
                                 if self.agree else None),
            semantic_center_drift_px=pct(self.drift, (50, 90, 100)),
            # mean valid semantic centers per instance on each side — when
            # 0, drift percentiles are null because there is nothing to
            # match (the engine found no parts on this corpus), not
            # because the comparison failed
            centers_per_instance=[
                round(float(np.mean(self.nctr_a)), 3) if self.nctr_a else 0.0,
                round(float(np.mean(self.nctr_b)), 3) if self.nctr_b else 0.0,
            ],
            map_fg_correlation=pct(self.corr, (10, 50)),
            n=len(self.iou),
        )


def isolated_stride(params, images):
    """Experiment 3: deterministic stride drift, all stochastic and
    learned choices shared between the two paths."""
    from attentionshift_tpu.ops.image import resize
    from attentionshift_tpu.pseudo.engine import candidate_boxes, masks_and_centers
    from attentionshift_tpu.pseudo.cam import norm_attns
    from attentionshift_tpu.pseudo.refine import sample_fgbg_points

    debug = seed_fn(EXACT, method=AttnShiftDetector.seed_debug)

    import functools

    @functools.lru_cache(maxsize=None)
    def boxes_fn(stride, iters):
        return jax.jit(lambda r, t, p: candidate_boxes(
            r, t, p, (H // 16, W // 16), (H, W), cam_stride=stride,
            ccl_iters=iters)[0])

    @functools.lru_cache(maxsize=None)
    def bc_fn(ms):
        return jax.jit(lambda k, c, vf, b, p, l, v, o_fg, o_bg: masks_and_centers(
            k, c, vf, b, p, l, v, map_stride=ms, img_hw=(H, W),
            points_override=(o_fg, o_bg)))

    def boxes_at(rows, tok, pts, stride, iters):
        return boxes_fn(stride, iters)(rows, tok, pts)

    def bc_at(key, cams, vit_feat, boxes, pts, lbls, val, ms, override):
        return bc_fn(ms)(key, cams, vit_feat, boxes, pts, lbls, val, *override)

    acc_box, acc_box16, acc = [], [], Acc()
    for i, (img, pts, lbl, val) in enumerate(images):
        inp = (jnp.asarray(img)[None], jnp.asarray(pts)[None],
               jnp.asarray(lbl)[None], jnp.asarray(val)[None],
               jnp.asarray([[float(W), float(H)]]))
        d = jax.tree.map(np.asarray, debug(params, *inp, jax.random.PRNGKey(7)))
        rows = jnp.asarray(d["rollout_rows"][0])  # (L, P, T)
        tok = jnp.asarray(d["token_of_gt"][0])
        gpts = jnp.asarray(pts)

        # Stage A: same rollout rows, only cam_stride differs (16 is the
        # would-be cheaper default — measured here to gate any change)
        bf = np.asarray(boxes_at(rows, tok, gpts, 8, 64))
        b16 = np.asarray(boxes_at(rows, tok, gpts, 16, 64))
        be = np.asarray(boxes_at(rows, tok, gpts, 1, 256))
        for gi in range(G):
            if val[gi]:
                acc_box += [box_iou(bf[gi, l], be[gi, l]) for l in range(BASE["cam_layer"])]
                acc_box16 += [box_iou(b16[gi, l], be[gi, l]) for l in range(BASE["cam_layer"])]

        # Stages B+C: shared MIL choice (exact run's), shared exact boxes,
        # shared full-res seed points
        best_idx = d["best_attn_idx"][0]
        cams_patch = d["cams"][0]  # (L, G, Hp, Wp)
        best_patch = jnp.asarray(np.stack(
            [cams_patch[best_idx[gi], gi] for gi in range(G)]))
        boxes = jnp.asarray(d["pseudo_gt_bboxes"][0])
        vit_feat = jnp.asarray(d["vit_feat"][0])
        cams_full = resize(best_patch, (H, W))
        cams_dec = resize(best_patch, (H // 4, W // 4))
        override = sample_fgbg_points(
            jax.random.PRNGKey(3), norm_attns(cams_full), gpts, 0.2, 0.1, 20,
            stride=1,
        )
        common = (jnp.asarray(pts), jnp.asarray(lbl), jnp.asarray(val))
        pf = jax.tree.map(np.asarray, bc_at(
            jax.random.PRNGKey(5), cams_dec, vit_feat, boxes, *common, 4, override))
        pe = jax.tree.map(np.asarray, bc_at(
            jax.random.PRNGKey(5), cams_full, vit_feat, boxes, *common, 1, override))
        wrap = lambda p: dict(
            pseudo_gt_bboxes=boxes[None], pseudo_gt_masks=p.pseudo_masks[None],
            best_attn_idx=best_idx[None], semantic_centers=p.centers.coords[None],
            semantic_centers_valid=p.centers.part_valid[None],
            map_cos_fg=p.map_fg[None],
        )
        acc.add(jax.tree.map(np.asarray, wrap(pf)), jax.tree.map(np.asarray, wrap(pe)), val)
        print(f"isolated image {i} done", flush=True)
    rep = acc.report()
    rep["stage_a_box_iou_all_layers"] = pct(acc_box, (10, 50, 90))
    rep["stage_a_box_iou_stride16"] = pct(acc_box16, (10, 50, 90))
    return rep, acc


def synthetic_center_drift():
    """Stride-4 vs stride-1 semantic-center drift on CONSTRUCTED features.

    Short training on the blob corpus leaves ViT features globally
    correlated (cosine > 0.8 everywhere), so ``filter_maps``'s 0.85
    fg-occupancy gate — reference semantics, `stdroi:265-275` with the
    caller's default — rejects every prototype and the corpus-based drift
    cells are null. Here part structure exists by construction: each
    instance's box contains two lobes with distinct (near-orthogonal)
    feature directions, so prototypes localise, survive the filter, and
    the stride effect on the extracted centers can be measured directly.
    """
    from attentionshift_tpu.pseudo.engine import masks_and_centers

    rng = np.random.RandomState(7)
    d, hp, wp = 384, H // 16, W // 16
    drift, nctr, in_fg = [], [], []
    for trial in range(16):
        base = rng.randn(d).astype(np.float32)
        feat = np.tile(base[:, None, None], (1, hp, wp))
        feat += rng.randn(d, hp, wp).astype(np.float32) * 0.05
        boxes, pts, fg = [], [], np.zeros((G, H, W), np.float32)
        for gi in range(2):
            x1, y1 = rng.randint(16, 200, 2)
            bw, bh = rng.randint(120, 240, 2)
            x2, y2 = min(x1 + bw, W - 1), min(y1 + bh, H - 1)
            boxes.append([x1, y1, x2, y2])
            pts.append([(x1 + x2) / 2, (y1 + y2) / 2])
            for li in range(2):  # two lobes with own feature directions
                lv = rng.randn(d).astype(np.float32) * 2.0
                lx1 = (x1 + li * (x2 - x1) // 2) // 16
                lx2 = (x1 + (li + 1) * (x2 - x1) // 2) // 16
                feat[:, y1 // 16 : y2 // 16, lx1:lx2] = (
                    lv[:, None, None] + rng.randn(d, 1, 1) * 0.05
                )
            fg[gi, y1:y2, x1:x2] = 1.0
        boxes = np.pad(np.asarray(boxes, np.float32), ((0, G - 2), (0, 0)))
        pts = np.pad(np.asarray(pts, np.float32), ((0, G - 2), (0, 0)))
        val = np.zeros((G,), bool); val[:2] = True
        lbl = np.zeros((G,), np.int32)

        outs = {}
        for ms in (4, 1):
            cams = jnp.asarray(fg[:, ::ms, ::ms])
            p = masks_and_centers(
                jax.random.PRNGKey(11), cams, jnp.asarray(feat),
                jnp.asarray(boxes), jnp.asarray(pts), jnp.asarray(lbl),
                jnp.asarray(val), map_stride=ms, img_hw=(H, W),
            )
            outs[ms] = jax.tree.map(np.asarray, p)
        for gi in range(2):
            nctr.append(int(outs[1].centers.part_valid[gi].sum()))
            drift += center_drift(
                outs[4].centers.coords[gi], outs[4].centers.part_valid[gi],
                outs[1].centers.coords[gi], outs[1].centers.part_valid[gi],
            )
            # px drift overstates harm: centers supplement the mask
            # head's positive supervision points, so what matters is
            # whether a fast-path center still lands ON the instance. A
            # tail "drift" here is the two equivalent lobes swapping
            # rank, not a center leaving the object.
            for c, v in zip(outs[4].centers.coords[gi],
                            outs[4].centers.part_valid[gi]):
                if v:
                    xi = int(np.clip(round(c[0]), 0, W - 1))
                    yi = int(np.clip(round(c[1]), 0, H - 1))
                    in_fg.append(float(fg[gi, yi, xi] > 0.5))
    return dict(
        center_drift_px=pct(drift, (50, 90, 100)),
        exact_centers_per_instance=round(float(np.mean(nctr)), 3),
        fast_center_in_fg_frac=(round(float(np.mean(in_fg)), 4)
                                if in_fg else None),
        n_pairs=len(drift),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=60)
    ap.add_argument("--train-images", type=int, default=8)
    ap.add_argument("--eval-images", type=int, default=8)
    ap.add_argument("--eval-size", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="evaluate the drift at this resolution instead of "
                         "the 512x512 training size (e.g. 800 1344 — the "
                         "flagship bench shape; sizes must be multiples of "
                         "16)")
    ap.add_argument("--ckpt", default=None, metavar="DIR",
                    help="params-only orbax checkpoint to study instead of "
                         "inline training (produce with "
                         "tools/analysis/learning_check.py --save-ckpt)")
    args = ap.parse_args()

    if args.ckpt:
        from attentionshift_tpu.train.checkpoint import restore_params

        tree = restore_params(os.path.abspath(args.ckpt))
        params = tree if "params" in tree else {"params": tree}
        provenance = f"checkpoint `{args.ckpt}`"
    else:
        params = train_params(args.train_steps, args.train_images)
        provenance = f"{args.train_steps} inline train steps"
    params = jax.tree.map(lambda x: x.astype(jnp.float32)
                          if x.dtype == jnp.bfloat16 else x, params)

    if args.eval_size:
        global H, W
        H, W = args.eval_size

    fast = seed_fn(FAST)
    exact = seed_fn(EXACT)

    rng = np.random.RandomState(100)  # held-out draws
    images = [make_sample(rng, i) for i in range(args.eval_images)]
    wh = jnp.asarray([[float(W), float(H)]])

    e2e, floor = Acc(), Acc()
    for i, (img, pts, lbl, val) in enumerate(images):
        inp = (jnp.asarray(img)[None], jnp.asarray(pts)[None],
               jnp.asarray(lbl)[None], jnp.asarray(val)[None], wh)
        t0 = time.time()
        rf = jax.tree.map(np.asarray, fast(params, *inp, jax.random.PRNGKey(7)))
        re = jax.tree.map(np.asarray, exact(params, *inp, jax.random.PRNGKey(7)))
        re2 = jax.tree.map(np.asarray, exact(params, *inp, jax.random.PRNGKey(8)))
        e2e.add(rf, re, val)
        floor.add(re, re2, val)
        print(f"image {i}: e2e fast/exact/exact2 in {time.time()-t0:.1f}s", flush=True)

    iso, iso_acc = isolated_stride(params, images)

    # Stable-subset view: the corpus's own exact-vs-exact noise floor has
    # fat tails (sampling stochasticity flips tail instances regardless
    # of stride), so the unconditional isolated-stride p10 conflates
    # stride drift with corpus instability. Restrict the isolated-stride
    # distribution to instances the noise floor itself calls stable
    # (exact-vs-exact mask IoU >= 0.9): what remains is the drift the
    # stride approximation causes on instances the pipeline can
    # reproduce at all. Both accumulators iterate the identical
    # (image, instance) sequence, so index-aligned filtering is exact.
    if len(floor.miou) == len(iso_acc.miou):
        stable = [i for i, v in enumerate(floor.miou) if v >= 0.9]
        iso["pseudo_mask_iou_stable_subset"] = pct(
            [iso_acc.miou[i] for i in stable], (10, 50, 90))
        iso["stable_subset_n"] = len(stable)

    # RoIAlign sampling-ratio sensitivity on SMOOTH (ViT-like) features:
    # stride-16 feature maps are low-frequency relative to the sampling
    # grid, so white noise would overstate the error. Mean + max reported.
    from attentionshift_tpu.ops.image import resize as _resize
    from attentionshift_tpu.ops.roi_align import roi_align
    lowres = np.random.RandomState(1).randn(1, 384, 8, 8).astype(np.float32)
    feat = np.asarray(_resize(jnp.asarray(lowres[0]), (32, 32)))[None]
    boxes = np.asarray([[0, 10.0, 10.0, 300.0, 200.0], [0, 50.0, 80.0, 120.0, 140.0],
                        [0, 0.0, 0.0, 511.0, 511.0]], np.float32)
    outs = {sr: np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                     1.0 / 16.0, output_size=7, sampling_ratio=sr))
            for sr in (1, 2, 4, 8)}
    ref8 = outs[8]
    scale = np.abs(ref8).mean() + 1e-9
    sr_err = {sr: dict(mean=round(float(np.abs(outs[sr] - ref8).mean() / scale), 5),
                       max=round(float(np.abs(outs[sr] - ref8).max() / scale), 5))
              for sr in (1, 2, 4)}

    syn = synthetic_center_drift()

    report = dict(
        params_provenance=provenance,
        train_steps=None if args.ckpt else args.train_steps,
        eval_images=args.eval_images,
        end_to_end=e2e.report(),
        sampling_noise_floor=floor.report(),
        isolated_stride=iso,
        synthetic_feature_center_drift=syn,
        roi_align_sr_rel_err_vs_sr8=sr_err,
    )
    print(json.dumps(report))

    def row(name, r):
        return (
            f"| {name} | {r['pseudo_box_iou']['p50']} / {r['pseudo_box_iou']['p10']} | "
            f"{r['pseudo_mask_iou']['p50']} / {r['pseudo_mask_iou']['p10']} | "
            f"{r['mil_layer_agreement']} | "
            f"{r['semantic_center_drift_px']['p50']} / {r['semantic_center_drift_px']['p90']} | "
            f"{r['map_fg_correlation']['p50']} |"
        )

    md = [
        "# FIDELITY — fast-path vs exact-path pseudo-label drift",
        "",
        "Defaults (`cam_stride=16`, `seed_map_stride=4`, RoIAlign `sampling_ratio=2`)",
        "vs exact reference semantics (`cam_stride=1`, `seed_map_stride=1`,",
        "`ccl_iters=256`), measured on a partially-trained flagship ViT-S at",
        f"{H}x{W} ({provenance}, trained on the synthetic blob dataset,",
        "held-out eval draws). Produced by `tools/analysis/fidelity_study.py`.",
        "",
        "Three comparisons (per-instance distributions):",
        "",
        "- **end-to-end**: both configs run the full `seed_pseudo_gt` with their",
        "  own stochastic seed-point draws — total pipeline variance;",
        "- **noise floor**: the exact config against itself with a different",
        "  sampling key — how much of the end-to-end drift is sampling",
        "  stochasticity, not stride;",
        "- **isolated stride**: shared rollout rows, MIL choice, boxes, and",
        "  full-res seed points; only the stride differs — the deterministic",
        "  cost of the approximation, which is what gates the defaults.",
        "",
        "| comparison | box IoU p50/p10 | mask IoU p50/p10 | MIL agree | center drift px p50/p90 | map_fg corr p50 |",
        "|---|---|---|---|---|---|",
        row("end-to-end", report["end_to_end"]),
        row("noise floor (exact vs exact)", report["sampling_noise_floor"]),
        row("isolated stride", report["isolated_stride"]),
        "",
        "Mean valid semantic centers per instance (fast / exact): "
        f"{report['end_to_end']['centers_per_instance'][0]} / "
        f"{report['end_to_end']['centers_per_instance'][1]} — null drift "
        "cells mean no valid centers existed to match on this corpus "
        "(short training leaves features globally correlated, so the "
        "reference's 0.85 fg-occupancy prototype filter rejects all; "
        "same behaviour as the reference on such features).",
        "",
        "Isolated-stride mask IoU on the NOISE-FLOOR-STABLE subset "
        "(instances whose exact-vs-exact IoU >= 0.9 — i.e. excluding "
        "instances the pipeline's own sampling stochasticity flips): "
        f"p10/p50/p90 = {iso.get('pseudo_mask_iou_stable_subset', {}).get('p10')} / "
        f"{iso.get('pseudo_mask_iou_stable_subset', {}).get('p50')} / "
        f"{iso.get('pseudo_mask_iou_stable_subset', {}).get('p90')} "
        f"(n = {iso.get('stable_subset_n')}).",
        "",
        "Semantic-center stride drift on CONSTRUCTED part-structured "
        "features (stride 4 vs 1, shared seeds): "
        f"p50/p90/p100 = {syn['center_drift_px']['p50']} / "
        f"{syn['center_drift_px']['p90']} / {syn['center_drift_px']['p100']} px, "
        f"{syn['exact_centers_per_instance']} centers/instance, "
        f"n = {syn['n_pairs']}; fraction of fast-path centers inside the "
        f"exact fg region = {syn['fast_center_in_fg_frac']} (a tail "
        "drift is the two equivalent part lobes swapping rank, not a "
        "supervision point leaving the object).",
        "",
        f"Stage-A candidate-box IoU across all layers (isolated, stride 8 vs 1 — "
        "the finer alternative): "
        f"p10/p50/p90 = {iso['stage_a_box_iou_all_layers']['p10']} / "
        f"{iso['stage_a_box_iou_all_layers']['p50']} / "
        f"{iso['stage_a_box_iou_all_layers']['p90']}",
        "",
        f"Same at stride 16 vs 1 (the SHIPPED default; the dominance gate): "
        f"p10/p50/p90 = {iso['stage_a_box_iou_stride16']['p10']} / "
        f"{iso['stage_a_box_iou_stride16']['p50']} / "
        f"{iso['stage_a_box_iou_stride16']['p90']}",
        "",
        "RoIAlign sampling-ratio drift vs sr=8 on smooth (ViT-like) features,",
        "relative to mean |feature|:",
        "",
        f"- sr=1: mean {sr_err[1]['mean']}, max {sr_err[1]['max']}",
        f"- sr=2: mean {sr_err[2]['mean']}, max {sr_err[2]['max']}",
        f"- sr=4: mean {sr_err[4]['mean']}, max {sr_err[4]['max']}",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(report, indent=2),
        "```",
        "",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "..", "FIDELITY.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote FIDELITY.md")


if __name__ == "__main__":
    main()
