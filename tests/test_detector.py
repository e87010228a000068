"""End-to-end tests for the AttnShiftDetector orchestration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests

from attentionshift_tpu.models.detector import AttnShiftDetector

TINY = dict(
    num_classes=6,
    embed_dim=96,
    depth=4,
    num_heads=6,
    out_indices=(0, 1, 2, 3),
    img_size=128,
    point_tokens=30,
    cam_layer=3,
    use_remat=False,
    max_gt=4,
    cam_stride=4,
    ccl_iters=16,
    num_mask_point_gt=6,
    corr_size=5,
    mean_shift_times=3,
    num_semantic_points=2,
    rpn_channels=32,
    num_proposals=64,
    rpn_nms_pre=64,
    rcnn_samples=32,
    rcnn_pos_fraction=0.25,
    mask_sample_cap=8,
    test_max_per_img=10,
)

B, H, W, G = 1, 128, 128, 4


@pytest.fixture(scope="module")
def model_and_params():
    model = AttnShiftDetector(**TINY)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((B, H, W, 3), jnp.float32)
    gt_points = jnp.asarray([[[40.0, 40.0], [90.0, 80.0], [0, 0], [0, 0]]])
    gt_labels = jnp.asarray([[1, 3, 0, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False]])
    img_wh = jnp.asarray([[128.0, 128.0]])
    params = model.init(
        {"params": rng, "sampling": rng, "dropout": rng},
        img, gt_points, gt_labels, gt_valid, img_wh,
    )
    return model, params


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    gt_points = jnp.asarray([[[40.0, 40.0], [90.0, 80.0], [0, 0], [0, 0]]])
    gt_labels = jnp.asarray([[1, 3, 0, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False]])
    img_wh = jnp.asarray([[128.0, 128.0]])
    return img, gt_points, gt_labels, gt_valid, img_wh


EXPECTED_LOSS_KEYS = {
    "loss_mil", "loss_rpn_cls", "loss_rpn_bbox", "loss_point_cls",
    "loss_point", "pos_point_acc", "loss_cls", "loss_bbox", "acc", "loss_mask",
}


def test_forward_train_losses(model_and_params):
    model, params = model_and_params
    img, pts, lbls, val, wh = _inputs()

    @jax.jit
    def step(params, img, pts, lbls, val, wh):
        return model.apply(
            params, img, pts, lbls, val, wh,
            rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(3)},
        )

    losses, aux = step(params, img, pts, lbls, val, wh)
    assert set(losses.keys()) == EXPECTED_LOSS_KEYS
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    pb = np.asarray(aux["pseudo_boxes"])
    assert pb.shape == (B, G, 4)
    assert (pb[..., 2] >= pb[..., 0]).all()
    assert np.asarray(aux["pseudo_masks"]).shape == (B, G, H, W)
    # padding slots carry no pseudo mask
    assert np.asarray(aux["pseudo_masks"])[0, 2:].sum() == 0


def test_forward_train_grads_flow(model_and_params):
    model, params = model_and_params
    img, pts, lbls, val, wh = _inputs(1)

    @jax.jit
    def loss_fn(params):
        losses, _ = model.apply(
            params, img, pts, lbls, val, wh,
            rngs={"sampling": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(4)},
        )
        return sum(v for k, v in losses.items() if k.startswith("loss"))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(jax.tree.map(lambda g: np.abs(np.asarray(g)).sum(), grads))
    total = float(np.sum(flat))
    assert np.isfinite(total) and total > 0
    # every major submodule receives gradient
    gp = grads["params"]
    for mod in ["backbone", "neck", "rpn_head", "mil_head", "bbox_head", "mask_head"]:
        s = float(np.sum(jax.tree.leaves(jax.tree.map(lambda g: np.abs(np.asarray(g)).sum(), gp[mod]))))
        assert s > 0, f"no gradient into {mod}"


def test_simple_test(model_and_params):
    model, params = model_and_params
    img, _, _, _, wh = _inputs(2)

    @jax.jit
    def run(params, img, wh):
        return model.apply(params, img, wh, method=AttnShiftDetector.simple_test)

    out = run(params, img, wh)
    k = TINY["test_max_per_img"]
    assert out.dets.boxes.shape == (B, k, 4)
    assert out.mask_probs.shape == (B, k, 28, 28)
    mp = np.asarray(out.mask_probs)
    assert ((mp >= 0) & (mp <= 1)).all()
    bx = np.asarray(out.dets.boxes)
    assert (bx >= 0).all() and (bx[..., 2] <= W).all() and (bx[..., 3] <= H).all()


def test_roi_and_simple_test_share_clip_semantics(model_and_params):
    """Both inference paths clip decoded boxes to the TRUE image extent
    (mmdet ``img_shape``), never the padded canvas — the round-1 paths
    diverged (padded-frame clip in roi_test vs img_wh in simple_test)."""
    model, params = model_and_params
    img, _, _, _, _ = _inputs(4)
    wh = jnp.asarray([[100.0, 80.0]])  # true extent < 128x128 canvas
    rois = jnp.asarray([[[10.0, 10.0, 120.0, 120.0], [0.0, 0.0, 60.0, 60.0]]])

    _, decoded = jax.jit(
        lambda p, i, r, w: model.apply(p, i, r, w, method=AttnShiftDetector.roi_test)
    )(params, img, rois, wh)
    bx = np.asarray(decoded)
    assert (bx >= 0).all()
    assert (bx[..., 0::2] <= 100.0).all() and (bx[..., 1::2] <= 80.0).all()

    out = jax.jit(
        lambda p, i, w: model.apply(p, i, w, method=AttnShiftDetector.simple_test)
    )(params, img, wh)
    dbx = np.asarray(out.dets.boxes)
    assert (dbx >= 0).all()
    assert (dbx[..., 0::2] <= 100.0).all() and (dbx[..., 1::2] <= 80.0).all()


def test_aug_test(model_and_params):
    from attentionshift_tpu.eval.aug_test import AugTester

    model, params = model_and_params
    rng = np.random.RandomState(3)
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    tester = AugTester(model, params, scales=[(96, 160), (64, 128)], flip=True)
    out = tester(img, max_dets=8)
    assert out["boxes"].shape == (8, 4)
    assert out["mask_probs"].shape == (8, 28, 28)
    assert np.isfinite(out["boxes"]).all()
    assert ((out["mask_probs"] >= 0) & (out["mask_probs"] <= 1)).all()
    # boxes live in the ORIGINAL frame
    assert (out["boxes"][:, 0::2] <= 140 + 1e-3).all()
    assert (out["boxes"][:, 1::2] <= 100 + 1e-3).all()


def test_keypoint_align_variant():
    """FasterRCNNPointSupAlignKeyPoint analog: extra dynamic-filter loss."""
    model = AttnShiftDetector(**{**TINY, "with_keypoint_align": True})
    rng = jax.random.PRNGKey(0)
    img, gt_points, gt_labels, gt_valid, img_wh = _inputs(7)
    params = model.init(
        {"params": rng, "sampling": rng, "dropout": rng},
        img, gt_points, gt_labels, gt_valid, img_wh,
    )
    losses, _ = model.apply(
        params, img, gt_points, gt_labels, gt_valid, img_wh,
        rngs={"sampling": rng, "dropout": rng},
    )
    assert "loss_keypoint_align" in losses
    assert np.isfinite(float(losses["loss_keypoint_align"]))

    # the head contributes gradients to the controller + backbone tokens
    def total(p):
        ls, _ = model.apply(
            p, img, gt_points, gt_labels, gt_valid, img_wh,
            rngs={"sampling": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        )
        return ls["loss_keypoint_align"]

    from jax.flatten_util import ravel_pytree

    g = jax.grad(total)(params)
    gsum = float(
        jnp.abs(ravel_pytree(g["params"]["keypoint_align_head"])[0]).sum()
    )
    assert gsum > 0


def test_seed_pseudo_gt_batch_invariant(model_and_params):
    """Batched seed generation reproduces the batch-1 result per image.

    Gates throughput benching / training at batch > 1: element 0 of a
    2-image batch must equal the solo run bit-for-bit (per-image work is
    independent; the per-instance rng key split gives element 1 its own
    stochastic draws, so only the solo-vs-slot-0 comparison is exact).
    """
    model, params = model_and_params
    img, pts, lbls, val, wh = _inputs(4)

    def seed(im, p, l, v, w):
        return model.apply(
            params, im, p, l, v, w,
            method=AttnShiftDetector.seed_pseudo_gt,
            rngs={"sampling": jax.random.PRNGKey(7)},
        )

    solo = seed(img, pts, lbls, val, wh)
    img2 = jnp.asarray(np.random.RandomState(99).randn(B, H, W, 3), jnp.float32)
    dup = seed(
        jnp.concatenate([img, img2]), jnp.concatenate([pts, pts]),
        jnp.concatenate([lbls, lbls]), jnp.concatenate([val, val]),
        jnp.concatenate([wh, wh]),
    )
    for k in solo:
        a, b = np.asarray(solo[k]), np.asarray(dup[k])
        if a.ndim == 0:  # batch-summed scalars (loss_mil) can't be compared
            assert np.isfinite(b), k
            continue
        assert b.shape[0] == 2, k
        np.testing.assert_allclose(a[0], b[0], atol=1e-5, err_msg=k)


def test_seed_debug_exposes_intermediates(model_and_params):
    """TwoStageDetectorPointSupVis analog: full intermediate dump."""
    model, params = model_and_params
    img, gt_points, gt_labels, gt_valid, img_wh = _inputs(8)
    out = model.apply(
        params, img, gt_points, gt_labels, gt_valid, img_wh,
        method=AttnShiftDetector.seed_debug, rngs={"sampling": jax.random.PRNGKey(0)},
    )
    L, P, g = TINY["cam_layer"], TINY["point_tokens"], 4
    hp = wp = H // 16
    assert out["rollout_rows"].shape == (B, L, P, 1 + hp * wp + P)
    assert out["candidate_boxes"].shape == (B, g, L, 4)
    assert out["cams"].shape == (B, L, g, hp, wp)
    assert out["best_cams"].shape == (B, g, hp, wp)
    assert out["token_of_gt"].shape == (B, g)
    assert out["pseudo_gt_bboxes"].shape == (B, g, 4)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k
