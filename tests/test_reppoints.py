"""Tests for the RepPoints-style part refinement head."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-detector / subprocess tests
import numpy as np
import jax
import jax.numpy as jnp

from attentionshift_tpu.models.reppoints import (
    RepPointsPartHead,
    contour_points,
    refine_fg_maps,
)

KEY = jax.random.PRNGKey(0)


def _inputs(b=1, g=3, p=2, hf=8, wf=8, c=16):
    rng = np.random.RandomState(0)
    h, w = hf * 16, wf * 16
    feats = jnp.asarray(rng.randn(b, hf, wf, c), jnp.float32)
    boxes = jnp.asarray([[[10, 10, 100, 100], [30, 30, 120, 110], [0, 0, 0, 0]]],
                        jnp.float32)
    centers = jnp.asarray(rng.rand(b, g, p, 2) * 90 + 15, jnp.float32)
    cval = jnp.asarray([[[True, True], [True, False], [False, False]]])
    gval = jnp.asarray([[True, True, False]])
    masks = np.zeros((b, g, h, w), np.uint8)
    masks[0, 0, 16:96, 16:96] = 1
    masks[0, 1, 32:104, 40:112] = 1
    fg = jnp.asarray(masks, jnp.float32)
    cont_xy, cont_val = contour_points(jnp.asarray(masks[0]), 16, KEY)
    return feats, boxes, centers, cval, gval, jnp.asarray(masks), fg, cont_xy[None], cont_val[None]


def test_contour_points_on_edge():
    m = np.zeros((1, 64, 64), np.uint8)
    m[0, 10:30, 20:50] = 1
    xy, valid = contour_points(jnp.asarray(m), 12, KEY)
    xy, valid = np.asarray(xy[0]), np.asarray(valid[0])
    assert valid.all()
    inner = m[0][np.clip(xy[:, 1].astype(int), 0, 63), np.clip(xy[:, 0].astype(int), 0, 63)]
    assert inner.all()  # on the mask
    # on the border ring: erosion removes them
    from scipy import ndimage

    er = ndimage.binary_erosion(m[0], np.ones((3, 3)))
    assert not er[xy[:, 1].astype(int), xy[:, 0].astype(int)].any()


def test_reppoints_head_losses_and_centers():
    head = RepPointsPartHead(num_points=5, feat_channels=32, stacked_convs=2)
    args = _inputs()
    params = head.init(KEY, *args)
    out = head.apply(params, *args)
    assert set(out.losses) == {
        "loss_rp_border", "loss_rp_chamfer_sem", "loss_rp_chamfer_contour",
        "loss_rp_cls",
    }
    for k, v in out.losses.items():
        assert np.isfinite(float(v)), k
    assert out.new_centers.shape == (1, 3, 2, 2)
    # invalid object/parts stay invalid
    nv = np.asarray(out.new_valid)
    assert not nv[0, 2].any()
    assert not nv[0, 1, 1]
    # refined centers stay inside their gt box where valid
    nc = np.asarray(out.new_centers)
    box = np.asarray(args[1][0, 0])
    sel = nc[0, 0][nv[0, 0]]
    assert ((sel[:, 0] >= box[0]) & (sel[:, 0] <= box[2])).all()


def test_reppoints_head_grads():
    head = RepPointsPartHead(num_points=5, feat_channels=32, stacked_convs=2)
    args = _inputs()
    params = head.init(KEY, *args)

    def loss_fn(p):
        out = head.apply(p, *args)
        return sum(out.losses.values())

    grads = jax.grad(loss_fn)(params)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_refine_fg_maps():
    rng = np.random.RandomState(1)
    D, Hp, Wp = 8, 8, 8
    H, W = 128, 128
    feat = (0.05 * rng.randn(D, Hp, Wp)).astype(np.float32)
    feat[0, :4, :] += 2.0  # distinctive top half
    feat[1, 4:, :] += 2.0  # distinctive bottom half
    fg = np.zeros((2, H, W), np.float32)
    fg[0, :64, :] = 1.0
    fg[1, 64:, :] = 1.0
    boxes = jnp.asarray([[0.0, 0.0, 127.0, 63.0], [0.0, 64.0, 127.0, 127.0]])
    centers = jnp.asarray([[[32.0, 16.0], [96.0, 32.0]],
                           [[32.0, 96.0], [96.0, 96.0]]])
    cval = jnp.asarray([[True, True], [True, True]])
    # fg prototypes = the two halves' mean features (+ a bg-support row);
    # bg prototypes orthogonal-ish noise
    fp = np.stack([feat[:, :4].mean((1, 2)), feat[:, 4:].mean((1, 2)),
                   0.05 * rng.randn(D).astype(np.float32)])
    bp = (0.05 * rng.randn(2, D)).astype(np.float32)
    valid = jnp.asarray([True, False])  # instance 1 is padding
    new, masks = refine_fg_maps(
        jnp.asarray(fg), jnp.asarray(feat), boxes, centers, cval,
        jnp.asarray(fp), jnp.asarray(bp), valid, jax.random.PRNGKey(0),
    )
    new = np.asarray(new)
    assert new.shape == (2, H, W)
    # instance 0: refined map peaks in the top half (center features there)
    assert new[0, :64].mean() > new[0, 64:].mean()
    # instance 1 is a padding slot -> keeps its old map
    np.testing.assert_allclose(new[1], fg[1], atol=1e-5)
    assert masks.dtype == np.uint8 or masks.dtype == jnp.uint8
