"""Tests for geometric losses and the memory bank."""

import numpy as np
import jax
import jax.numpy as jnp

from attentionshift_tpu.core.losses_geom import (
    chamfer_distance,
    chamfer_loss,
    info_nce_loss,
    pts_border_loss,
    sim_masked_chamfer_loss,
)
from attentionshift_tpu.models.memory_bank import (
    align_loss,
    bank_append,
    init_bank,
    retrieve_similar,
)


# ------------------------------------------------------------- chamfer
def test_chamfer_distance_identical_zero():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 5, 2), jnp.float32)
    d = chamfer_distance(x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_chamfer_distance_oracle():
    x = jnp.asarray([[[0.0, 0.0], [1.0, 0.0]]])
    y = jnp.asarray([[[0.0, 1.0]]])
    # x->y: mean(1, sqrt(2)); y->x: 1 ; total /2
    want = ((1 + np.sqrt(2)) / 2 + 1) / 2
    np.testing.assert_allclose(float(chamfer_distance(x, y)[0]), want, rtol=1e-6)


def test_chamfer_masks_exclude_padding():
    x = jnp.asarray([[[0.0, 0.0], [50.0, 50.0]]])
    y = jnp.asarray([[[0.0, 0.0], [99.0, 99.0]]])
    xv = jnp.asarray([[True, False]])
    yv = jnp.asarray([[True, False]])
    d = chamfer_distance(x, y, xv, yv)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_chamfer_loss_obj_valid():
    x = jnp.asarray(np.random.RandomState(1).rand(3, 4, 2), jnp.float32)
    y = x + 0.0
    garbage = y.at[2].set(1000.0)
    ov = jnp.asarray([True, True, False])
    l = chamfer_loss(x, garbage, obj_valid=ov)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-6)


def test_sim_masked_chamfer():
    N, K, Pp, Pc, D = 1, 2, 3, 4, 8
    rng = np.random.RandomState(0)
    part_pts = jnp.asarray(rng.rand(N, K, Pp, 2) * 10, jnp.float32)
    contour = jnp.asarray(rng.rand(N, Pc, 2) * 10, jnp.float32)
    feats_p = jnp.asarray(np.eye(D)[:K][None], jnp.float32)  # orthogonal parts
    feats_c = jnp.asarray(np.stack([np.eye(D)[0]] * Pc)[None], jnp.float32)
    pv = jnp.ones((N, K), bool)
    cv = jnp.ones((N, Pc), bool)
    ov = jnp.ones((N,), bool)
    # part 0 matches all contour feats; part 1 matches none -> contributes 0
    l = sim_masked_chamfer_loss(part_pts, contour, feats_p, feats_c, pv, cv, ov)
    d0 = chamfer_distance(part_pts[:, 0], contour)[0]
    np.testing.assert_allclose(float(l), float(d0) / 2, rtol=1e-5)


# --------------------------------------------------------------- border
def test_pts_border_loss_inside_zero():
    pts = jnp.asarray([[2.0, 2.0, 5.0, 5.0]])  # two points, flattened
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert float(pts_border_loss(pts, boxes)) == 0.0


def test_pts_border_loss_outside_oracle():
    # one point 3px left of the box
    pts = jnp.asarray([[-3.0, 5.0]])
    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    # left-side mean = 3, others 0 -> mean over 4 sides = 0.75
    np.testing.assert_allclose(float(pts_border_loss(pts, boxes)), 0.75, rtol=1e-6)


# -------------------------------------------------------------- infonce
def test_info_nce_perfect_alignment_low_loss():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(6, 16), jnp.float32)
    neg = jnp.asarray(rng.randn(10, 16), jnp.float32)
    l_aligned = info_nce_loss(q, q, neg, temperature=0.05)
    l_random = info_nce_loss(q, jnp.asarray(rng.randn(6, 16), jnp.float32), neg,
                             temperature=0.05)
    assert float(l_aligned) < float(l_random)


def test_info_nce_inbatch_negatives():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(8, 16), jnp.float32)
    l = info_nce_loss(q, q, None, temperature=0.1)
    assert float(l) < 0.5  # diagonal dominates


# ----------------------------------------------------------- memory bank
def test_bank_append_and_retrieve():
    bank = init_bank(num_classes=3, queue_len=4, max_parts=2, dim=8)
    tok = jnp.ones((8,))
    parts = jnp.ones((2, 8))
    pv = jnp.asarray([True, False])
    box = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    bank = bank_append(bank, jnp.asarray(1), tok, parts, pv, box)
    assert bool(bank.slot_valid[1, 0])
    assert int(bank.ptr[1]) == 1
    assert not bool(bank.slot_valid[0].any())

    # same class, same token, same shape -> retrieved
    keep = retrieve_similar(bank, jnp.asarray(1), tok, box)
    assert bool(keep[0])
    # very different aspect ratio -> rejected
    keep2 = retrieve_similar(bank, jnp.asarray(1), tok, jnp.asarray([0, 0, 100.0, 1.0]))
    assert not bool(keep2[0])
    # orthogonal token -> rejected
    tok2 = jnp.zeros((8,)).at[0].set(1.0) - jnp.ones((8,)) * 0  # orthogonal-ish
    tok2 = jnp.asarray([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0])
    keep3 = retrieve_similar(bank, jnp.asarray(1), tok2, box)
    assert not bool(keep3[0])


def test_bank_circular_wraparound():
    bank = init_bank(num_classes=1, queue_len=2, max_parts=1, dim=4)
    for i in range(3):
        bank = bank_append(
            bank, jnp.asarray(0), jnp.full((4,), float(i + 1)),
            jnp.full((1, 4), float(i + 1)), jnp.ones((1,), bool),
            jnp.asarray([0.0, 0.0, 1.0, 1.0]),
        )
    assert int(bank.ptr[0]) == 1
    # slot 0 overwritten by the third append
    np.testing.assert_allclose(np.asarray(bank.tokens[0, 0]), 3.0)
    np.testing.assert_allclose(np.asarray(bank.tokens[0, 1]), 2.0)


def test_bank_append_disabled_noop():
    bank = init_bank(1, 2, 1, 4)
    bank2 = bank_append(
        bank, jnp.asarray(0), jnp.ones((4,)), jnp.ones((1, 4)),
        jnp.ones((1,), bool), jnp.zeros((4,)), enable=False,
    )
    assert not bool(bank2.slot_valid.any())
    assert int(bank2.ptr[0]) == 0


def test_align_loss_identical_parts_zero():
    bank = init_bank(1, 2, 2, 8)
    parts = jnp.asarray(np.random.RandomState(0).rand(2, 8), jnp.float32)
    tok = jnp.ones((8,))
    box = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    bank = bank_append(bank, jnp.asarray(0), tok, parts, jnp.ones((2,), bool), box)
    l = align_loss(bank, jnp.asarray(0), tok, parts, jnp.ones((2,), bool), box)
    np.testing.assert_allclose(float(l), 0.0, atol=1e-5)
    # empty bank -> 0
    l0 = align_loss(init_bank(1, 2, 2, 8), jnp.asarray(0), tok, parts,
                    jnp.ones((2,), bool), box)
    assert float(l0) == 0.0


def test_bank_jit_compatible():
    bank = init_bank(2, 3, 2, 4)

    @jax.jit
    def step(bank, c, tok, parts, box):
        bank = bank_append(bank, c, tok, parts, jnp.ones((2,), bool), box)
        l = align_loss(bank, c, tok, parts, jnp.ones((2,), bool), box)
        return bank, l

    bank, l = step(bank, jnp.asarray(1), jnp.ones((4,)), jnp.ones((2, 4)),
                   jnp.asarray([0.0, 0.0, 4.0, 4.0]))
    assert np.isfinite(float(l))
    assert bool(bank.slot_valid[1, 0])
