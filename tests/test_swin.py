"""Tests for the Swin backbone + attnshift hook."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests
import numpy as np
import jax
import jax.numpy as jnp

from attentionshift_tpu.models.swin import (
    SwinTransformer,
    _shift_mask,
    window_partition,
    window_reverse,
)

KEY = jax.random.PRNGKey(0)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    m = _shift_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # the top-left window has a single region -> all-zero mask
    np.testing.assert_array_equal(m[0], 0.0)
    # the bottom-right window mixes 4 regions -> some -100 entries
    assert (m[-1] == -100.0).any()
    assert (np.diagonal(m[-1]) == 0.0).all()


@pytest.mark.slow
def test_swin_jittable_above_constant_lift_threshold():
    """Swin must trace under an enclosing jax.jit at REAL sizes: jax
    lifts large closure constants into tracers, which broke the old
    jnp-round-tripped shift mask at 256x256 (64x64 stage-0 region map)
    while the small unit-test sizes stayed concrete."""
    model = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=8
    )
    img = jnp.zeros((1, 256, 256, 3))
    params = jax.jit(lambda r: model.init(r, img))(KEY)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    f = out["feature"]
    assert f[0].shape == (1, 64, 64, 32)
    assert bool(jnp.isfinite(f[0]).all())


def test_swin_pyramid_shapes():
    model = SwinTransformer(
        embed_dim=32, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4), window_size=4
    )
    img = jnp.zeros((1, 64, 64, 3))
    params = model.init(KEY, img)
    out = model.apply(params, img)
    f = out["feature"]
    assert len(f) == 4
    assert f[0].shape == (1, 16, 16, 32)
    assert f[1].shape == (1, 8, 8, 64)
    assert f[2].shape == (1, 4, 4, 128)
    assert f[3].shape == (1, 2, 2, 256)  # wait: 64/4=16 -> /2 -> 8,4,2


def test_swin_attnshift_contract():
    model = SwinTransformer(
        embed_dim=32, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4), window_size=4,
        attnshift=True, point_tokens=10, num_classes=5, global_blocks=2,
    )
    img = jax.random.normal(KEY, (1, 64, 64, 3))
    params = model.init(KEY, img)
    out = model.apply(params, img)
    n_patch = 2 * 2
    t = 1 + n_patch + 10
    assert out["attns"].shape == (2, 1, t, t)
    assert out["last_feat"].shape == (1, 1 + n_patch, 256)
    assert out["outputs_class"].shape == (1, 10, 5)
    assert out["outputs_coord"].shape == (1, 10, 2)
    oc = np.asarray(out["outputs_coord"])
    assert ((oc >= 0) & (oc <= 1)).all()
    # attention rows over (patches | points) sum to 1 for real rows
    a = np.asarray(out["attns"])[0, 0]
    np.testing.assert_allclose(a[1:].sum(-1), 1.0, rtol=1e-4)


def test_swin_attnshift_engine_compatible():
    """The pseudo-label engine runs on Swin attnshift outputs."""
    from attentionshift_tpu.pseudo.engine import candidate_boxes
    from attentionshift_tpu.pseudo.rollout import attention_rollout_point_rows

    model = SwinTransformer(
        embed_dim=32, depths=(1, 1, 1, 1), num_heads=(2, 2, 4, 4), window_size=4,
        attnshift=True, point_tokens=8, num_classes=5, global_blocks=2,
    )
    img = jax.random.normal(KEY, (1, 128, 128, 3))
    params = model.init(KEY, img)
    out = model.apply(params, img)
    rollout = attention_rollout_point_rows(out["attns"], 8)  # (L, B, P, T)
    hp = wp = 128 // 32
    boxes, cams = candidate_boxes(
        rollout[:, 0], jnp.asarray([0, 1], jnp.int32),
        jnp.asarray([[40.0, 40.0], [90.0, 80.0]]),
        (hp, wp), (128, 128), cam_stride=8, ccl_iters=8,
    )
    assert boxes.shape == (2, 2, 4)
    assert np.isfinite(np.asarray(boxes)).all()
