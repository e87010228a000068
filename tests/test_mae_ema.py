"""Tests for the MAE aux head and the EMA teacher path."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests
import numpy as np
import jax
import jax.numpy as jnp

from attentionshift_tpu.models.mae_head import MAEDecoderHead, patchify
from attentionshift_tpu.train.ema import ema_update

KEY = jax.random.PRNGKey(0)


def test_patchify_roundtrip_values():
    img = jnp.arange(1 * 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
    p = patchify(img, 16)
    assert p.shape == (1, 4, 16 * 16 * 3)
    # first patch first pixel = img[0,0,0]
    np.testing.assert_allclose(p[0, 0, :3], img[0, 0, 0])
    # second patch starts at column 16
    np.testing.assert_allclose(p[0, 1, :3], img[0, 0, 16])


def test_mae_head_loss():
    head = MAEDecoderHead(in_channels=48, embed_dim=32, depth=2, num_heads=4)
    b, hp, wp = 2, 4, 4
    tokens = jax.random.normal(KEY, (b, 1 + hp * wp, 48))
    img = jax.random.normal(jax.random.PRNGKey(1), (b, hp * 16, wp * 16, 3))
    params = head.init(KEY, tokens, img, jax.random.PRNGKey(2))
    loss = head.apply(params, tokens, img, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss)) and float(loss) > 0

    # gradients flow to decoder params
    g = jax.grad(lambda p: head.apply(p, tokens, img, jax.random.PRNGKey(3)))(params)
    tot = sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(g))
    assert tot > 0


def test_ema_update():
    t = {"w": jnp.zeros((3,))}
    s = {"w": jnp.ones((3,))}
    t2 = ema_update(t, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(t2["w"]), 0.1, rtol=1e-6)
    t3 = ema_update(t2, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(t3["w"]), 0.19, rtol=1e-6)


@pytest.mark.medium
def test_detector_teacher_path():
    """Train forward with an EMA teacher driving the pseudo-label engine."""
    from attentionshift_tpu.models.detector import AttnShiftDetector

    tiny = dict(
        num_classes=4, embed_dim=48, depth=4, num_heads=6, out_indices=(0, 1, 2, 3),
        img_size=64, point_tokens=10, cam_layer=3, use_remat=False, max_gt=2,
        cam_stride=4, ccl_iters=8, num_mask_point_gt=4, corr_size=3,
        mean_shift_times=2, num_semantic_points=2, rpn_channels=16,
        num_proposals=16, rpn_nms_pre=16, rcnn_samples=8, mask_sample_cap=4,
    )
    model = AttnShiftDetector(**tiny)
    B, H, W, G = 1, 64, 64, 2
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, H, W, 3))
    pts = jnp.asarray([[[20.0, 20.0], [40.0, 44.0]]])
    lbls = jnp.asarray([[1, 3]], jnp.int32)
    val = jnp.ones((B, G), bool)
    wh = jnp.asarray([[64.0, 64.0]])
    params = model.init(
        {"params": rng, "sampling": rng, "dropout": rng}, img, pts, lbls, val, wh
    )
    teacher = jax.tree.map(lambda x: x, params)

    @jax.jit
    def step(params, teacher):
        tout = model.apply(teacher, img, method=AttnShiftDetector.backbone_forward)
        losses, aux = model.apply(
            params, img, pts, lbls, val, wh, teacher=tout,
            rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        )
        return losses

    losses = step(params, teacher)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
