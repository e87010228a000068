"""Tests for the reference's orphaned-variant components.

Covers SimpleCondInstHead (keypoint-align dynamic-filter head),
MAEVisionTransformer (sinusoid-pos-embed backbone + split attention),
DINO/iBOT projection heads, the masked-image-modeling ViT forward, and
the class-agnostic supervision-point generator (convex-hull core
regions), each against small hand-checkable oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.mark.slow
def test_condinst_head_shapes_and_masking():
    from attentionshift_tpu.models.condinst import SimpleCondInstHead

    head = SimpleCondInstHead(feat_channels=8, num_layers=3, mlp_hidden=32)
    n, p, dt, dp = 4, 6, 16, 12
    rng = np.random.RandomState(0)
    tok = jnp.asarray(rng.randn(n, dt), jnp.float32)
    parts = jnp.asarray(rng.randn(p, dp), jnp.float32)
    labels = jnp.asarray(rng.randint(0, n, (p,)), jnp.int32)
    pv = jnp.asarray([True, True, True, False, True, False])
    tv = jnp.ones((n,), bool)

    params = head.init(jax.random.PRNGKey(0), tok, parts, labels, pv, tv)
    out = head.apply(params, tok, parts, labels, pv, tv)
    loss = out["loss_keypoint_align"]
    assert np.isfinite(float(loss)) and float(loss) > 0

    # all parts invalid -> zero loss (reference zero-like fallback)
    zero = head.apply(params, tok, parts, labels, jnp.zeros((p,), bool), tv)
    assert float(zero["loss_keypoint_align"]) == 0.0

    # invalid parts must not influence the loss value
    parts2 = parts.at[3].set(1e3)
    same = head.apply(params, tok, parts2, labels, pv, tv)
    np.testing.assert_allclose(
        float(loss), float(same["loss_keypoint_align"]), rtol=1e-6
    )

    # gradient flows to the controller
    g = jax.grad(
        lambda q: head.apply(q, tok, parts, labels, pv, tv)["loss_keypoint_align"]
    )(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), g, 0.0
    )
    assert gnorm > 0


@pytest.mark.slow
def test_condinst_dynamic_params_separate_instances():
    """A trained-by-hand controller separates parts by instance."""
    from attentionshift_tpu.models.condinst import SimpleCondInstHead

    head = SimpleCondInstHead(feat_channels=4, num_layers=2, mlp_hidden=8)
    n, p = 2, 8
    rng = np.random.RandomState(1)
    tok = jnp.asarray(np.eye(n, 6), jnp.float32)
    parts = jnp.asarray(rng.randn(p, 5), jnp.float32)
    labels = jnp.asarray(rng.randint(0, n, (p,)), jnp.int32)
    pv = jnp.ones((p,), bool)
    tv = jnp.ones((n,), bool)
    params = head.init(jax.random.PRNGKey(0), tok, parts, labels, pv, tv)

    import optax

    tx = optax.adam(1e-2)
    state = tx.init(params)
    loss_fn = lambda q: head.apply(q, tok, parts, labels, pv, tv)[
        "loss_keypoint_align"
    ]
    l0 = float(loss_fn(params))
    for _ in range(60):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0 * 0.5


def test_mae_encoder_pyramid_shapes():
    from attentionshift_tpu.models.mae_encoder import MAEVisionTransformer

    m = MAEVisionTransformer(
        embed_dim=32, depth=4, num_heads=2, out_indices=(0, 1, 2, 3),
    )
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)
    feats = m.apply(params, img)
    assert len(feats) == 4
    assert feats[0].shape == (1, 16, 24, 32)  # stride 4
    assert feats[1].shape == (1, 8, 12, 32)  # stride 8
    assert feats[2].shape == (1, 4, 6, 32)  # stride 16
    assert feats[3].shape == (1, 2, 3, 32)  # stride 32


def test_mae_encoder_split_attention_runs():
    from attentionshift_tpu.models.mae_encoder import MAEVisionTransformer

    m = MAEVisionTransformer(
        embed_dim=32, depth=2, num_heads=2, out_indices=(0, 1),
        with_fpn=False, split_attn_freq=2, window=2,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)
    f_split = m.apply(params, img)
    m2 = m.copy(split_attn_freq=0)
    f_global = m2.apply(params, img)
    # same params, different attention footprint -> different features
    assert not np.allclose(np.asarray(f_split[0]), np.asarray(f_global[0]))


def test_sinusoid_table_matches_reference_formula():
    from attentionshift_tpu.models.mae_encoder import get_sinusoid_encoding_table

    tab = get_sinusoid_encoding_table(7, 10)
    # independent construction straight from the formula
    for pos in range(7):
        for i in range(10):
            ang = pos / np.power(10000.0, 2 * (i // 2) / 10)
            want = np.sin(ang) if i % 2 == 0 else np.cos(ang)
            np.testing.assert_allclose(tab[pos, i], want, rtol=1e-6, atol=1e-7)


def test_mae_encoder_layerscale_zero_init_behaviour():
    from attentionshift_tpu.models.mae_encoder import MAEVisionTransformer

    m = MAEVisionTransformer(
        embed_dim=16, depth=1, num_heads=2, out_indices=(0,), with_fpn=False,
        init_values=1e-4,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), img)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(k.key) for k in p) for p, _ in flat]
    assert any("gamma_1" in n for n in names)
    out = m.apply(params, img)
    assert np.isfinite(np.asarray(out[0])).all()


def test_dino_head_weight_norm_invariance():
    from attentionshift_tpu.models.ssl import DINOHead

    head = DINOHead(out_dim=32, hidden_dim=16, bottleneck_dim=8)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 12), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    y0 = head.apply(params, x)
    assert y0.shape == (4, 32)
    # scaling prototype rows must not change the output (frozen unit gain)
    import flax

    p2 = flax.core.unfreeze(params)
    p2["params"]["last_layer"]["weight_v"] = (
        p2["params"]["last_layer"]["weight_v"] * 7.5
    )
    y1 = head.apply(flax.core.freeze(p2), x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-5, atol=1e-5)


def test_ibot_head_cls_and_patch_paths():
    from attentionshift_tpu.models.ssl import IBOTHead

    head = IBOTHead(out_dim=16, patch_out_dim=24, hidden_dim=16, bottleneck_dim=8)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 12), jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    cls_logits, patch_logits = head.apply(params, x)
    assert cls_logits.shape == (2, 16)
    assert patch_logits.shape == (2, 4, 24)
    # 2-D input = cls path only
    y = head.apply(params, x[:, 0])
    assert y.shape == (2, 16)

    shared = IBOTHead(
        out_dim=16, patch_out_dim=24, hidden_dim=16, bottleneck_dim=8,
        shared_head=True,
    )
    sp = shared.init(jax.random.PRNGKey(0), x)
    c2, p2 = shared.apply(sp, x)
    assert p2.shape == (2, 4, 16)  # shared head -> cls out_dim


def test_mim_vit_mask_token_substitution():
    from attentionshift_tpu.models.ssl import MIMViT

    m = MIMViT(embed_dim=32, depth=2, num_heads=2, img_size=32)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    mask = jnp.zeros((1, 4), bool).at[0, 1].set(True)
    params = m.init(jax.random.PRNGKey(0), img, mask)
    full = m.apply(params, img)
    masked = m.apply(params, img, mask)
    assert full.shape == (1, 5, 32)
    assert not np.allclose(np.asarray(full[0, 2]), np.asarray(masked[0, 2]))


# ---------------------------------------------------------------------------
# supervision point generator


def test_convex_hull_mask_vs_cv2():
    cv2 = pytest.importorskip("cv2")
    from attentionshift_tpu.models.point_generator import convex_hull_mask

    rng = np.random.RandomState(0)
    H = W = 48
    for trial in range(5):
        pts = rng.uniform(4, 44, (7, 2)).astype(np.float32)
        ours = np.asarray(convex_hull_mask(jnp.asarray(pts), (H, W), 1.0))
        ref = np.zeros((H, W), np.uint8)
        hull = cv2.convexHull(pts.astype(np.int64).astype(np.int32))
        cv2.fillConvexPoly(ref, hull, 1)
        ref = ref.astype(bool)
        inter = (ours & ref).sum()
        union = (ours | ref).sum()
        assert inter / max(union, 1) > 0.8, f"trial {trial}: IoU too low"


def test_convex_hull_mask_degenerate():
    from attentionshift_tpu.models.point_generator import convex_hull_mask

    # collinear points: must stay bounded by the segment's box
    pts = jnp.asarray([[4.0, 4.0], [10.0, 10.0], [16.0, 16.0]])
    m = np.asarray(convex_hull_mask(pts, (24, 24), 1.0))
    ys, xs = np.nonzero(m)
    assert m.sum() > 0
    assert xs.min() >= 2 and xs.max() <= 17 and ys.min() >= 2 and ys.max() <= 17


def test_supervision_point_generator_end_to_end():
    from attentionshift_tpu.models.point_generator import SupervisionPointGenerator

    gen = SupervisionPointGenerator(
        point_strides=16, mask_thr=0.5, point_thr=0.3, raster_stride=4
    )
    hf = wf = 4  # 64x64 image
    k = 4
    # constant offset field: contour points form a +-12px square around
    # the anchor
    square = np.asarray(
        [[-12, -12], [12, -12], [12, 12], [-12, 12]], np.float32
    ) / 16.0
    field = np.tile(square.reshape(-1)[:, None, None], (1, hf, wf))
    ctr = jnp.asarray(field, jnp.float32)

    # object 0: two overlapping parts; object 1: one part far away;
    # slot 3 invalid
    init = jnp.asarray(
        [[20.0, 20.0], [26.0, 22.0], [50.0, 50.0], [0.0, 0.0]], jnp.float32
    )
    part_obj = jnp.asarray([0, 0, 1, 1], jnp.int32)
    valid = jnp.asarray([True, True, True, False])

    out = gen(ctr, init, part_obj, valid, num_objects=2)
    assert out.pred_points.shape == (4, k, 2)
    assert out.core_regions.shape == (2, 16, 16)
    assert out.core_regions[0].sum() > 0 and out.core_regions[1].sum() > 0
    keep = np.asarray(out.keep)
    assert keep[0] and keep[1]  # overlapping parts cover the joint core
    assert keep[2]  # single part == its own core
    assert not keep[3]  # invalid slot
    scores = np.asarray(out.scores)
    assert np.isfinite(scores).all() and (scores >= 0).all()


def test_water_fill_matches_reference_semantics():
    """Greedy coverage prototype extraction (crf.py:147-188 oracle)."""
    import torch

    from attentionshift_tpu.pseudo.crf import water_fill

    rng = np.random.RandomState(0)
    n, d = 24, 6
    feats = rng.randn(n, d).astype(np.float32)
    sim = (rng.rand(n, n) * 0.6 + 0.2).astype(np.float32)
    np.fill_diagonal(sim, 1.0)
    attn = (rng.rand(n) > 0.5).astype(np.float32)

    # reference loop (water_fill_adaptive with thr)
    thr = 0.55
    sim_t = torch.from_numpy(sim.copy())
    attn_t = torch.from_numpy(attn.copy())
    sim_t[sim_t <= thr] = 0
    want, k = [], 4
    for i in range(k):
        s_in = sim_t @ attn_t
        s, idx = torch.max(s_in, dim=0)
        if s > 0 or i == 0:
            want.append(feats[idx])
        else:
            break
        new_in = (sim_t[idx] > 0).float()
        attn_t = (attn_t - new_in * (attn_t > 0)).clamp(0, 1)

    prots, valid = water_fill(
        jnp.asarray(feats), jnp.asarray(sim), jnp.asarray(attn),
        n_iter=k, thr=thr,
    )
    got = np.asarray(prots)[np.asarray(valid)]
    assert got.shape == np.stack(want).shape
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-6)


# ------------------------------------------------------------- det CAM
def test_det_box_score_target_semantics():
    """DetBoxScoreTarget parity (`det_cam_visualizer.py:402-447`): a
    matching detection contributes IoU + score (+ mask dice); a
    label-mismatched or low-IoU one contributes 0."""
    from attentionshift_tpu.utils.det_cam import det_box_score

    det_boxes = jnp.asarray([[10.0, 10, 50, 50], [60, 60, 90, 90]])
    det_scores = jnp.asarray([0.9, 0.8])
    det_labels = jnp.asarray([2, 5], jnp.int32)
    det_valid = jnp.asarray([True, True])

    # exact-match focal box, same label -> IoU 1.0 + 0.9
    s = det_box_score(det_boxes, det_scores, det_labels, det_valid,
                      jnp.asarray([[10.0, 10, 50, 50]]),
                      jnp.asarray([2], jnp.int32))
    np.testing.assert_allclose(float(s), 1.9, rtol=1e-5)
    # label mismatch -> 0
    s = det_box_score(det_boxes, det_scores, det_labels, det_valid,
                      jnp.asarray([[10.0, 10, 50, 50]]),
                      jnp.asarray([3], jnp.int32))
    assert float(s) == 0.0
    # no overlap -> 0
    s = det_box_score(det_boxes, det_scores, det_labels, det_valid,
                      jnp.asarray([[200.0, 200, 250, 250]]),
                      jnp.asarray([2], jnp.int32))
    assert float(s) == 0.0
    # mask term: identical masks add inter/(a+b) = 0.5
    m = jnp.zeros((2, 8, 8)).at[:, 2:6, 2:6].set(1.0)
    s = det_box_score(det_boxes, det_scores, det_labels, det_valid,
                      jnp.asarray([[10.0, 10, 50, 50]]),
                      jnp.asarray([2], jnp.int32),
                      det_masks=m, focal_masks=m[:1])
    np.testing.assert_allclose(float(s), 1.9 + 0.5, rtol=1e-4)


def test_eigen_cam_and_featmap_am():
    from attentionshift_tpu.utils.det_cam import eigen_cam, featmap_am

    rng = np.random.RandomState(0)
    pattern = np.abs(rng.rand(6, 7)).astype(np.float32)
    v = rng.rand(16).astype(np.float32)
    acts = v[:, None, None] * pattern[None]  # rank-1
    cam = eigen_cam(acts)
    assert cam.shape == (6, 7) and cam.max() <= 1.0 and cam.min() >= 0.0
    # rank-1: the cam is the relu'd centred pattern, so it must
    # correlate strongly with the pattern's above-mean structure
    want = np.maximum(pattern - pattern.mean(), 0.0)
    c = np.corrcoef(cam.ravel(), want.ravel())[0, 1]
    assert c > 0.95, c

    am = featmap_am(acts)
    assert am.shape == (6, 7) and 0.0 <= am.min() and am.max() <= 1.0


@pytest.mark.slow
def test_grad_cam_end_to_end_tiny_detector():
    """grad-CAM through test_from_feats: finite, normalised, nonzero
    when the focal box is the detector's own top detection."""
    import jax

    from attentionshift_tpu.models.detector import AttnShiftDetector
    from attentionshift_tpu.utils.det_cam import cam_on_image, grad_cam

    model = AttnShiftDetector(
        num_classes=20, embed_dim=96, depth=4, num_heads=2, img_size=64,
        out_indices=(0, 1, 2, 3), point_tokens=8, cam_layer=2, max_gt=4,
        use_remat=False, num_proposals=32, rpn_nms_pre=32, rcnn_samples=16,
        mask_sample_cap=4, test_max_per_img=8, test_score_thr=0.0,
    )
    H = W = 96
    img = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3), jnp.float32)
    wh = jnp.asarray([[float(W), float(H)]])
    params = model.init(
        jax.random.PRNGKey(0), img, wh, method=type(model).simple_test)
    out = model.apply(params, img, wh, method=type(model).simple_test)
    k = int(np.asarray(out.dets.valid[0]).argmax())
    focal_boxes = jnp.asarray(out.dets.boxes[0][k:k + 1])
    focal_labels = jnp.asarray(out.dets.labels[0][k:k + 1])

    cam = grad_cam(model, params, img, wh, focal_boxes, focal_labels,
                   match_iou_thr=0.1)
    hp = wp = H // 16
    assert cam.shape == (hp, wp)
    assert np.isfinite(cam).all() and 0.0 <= cam.min() and cam.max() <= 1.0

    over = cam_on_image(
        (np.random.RandomState(1).rand(H, W, 3) * 255).astype(np.uint8), cam)
    assert over.shape == (H, W, 3) and over.dtype == np.uint8
