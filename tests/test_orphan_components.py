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
