"""Golden-value tests for low-level ops against torch/scipy references."""

import numpy as np
import pytest

import jax.numpy as jnp

from attentionshift_tpu import ops
from attentionshift_tpu.core import linear_sum_assignment


def torch_available():
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("shape", [((7, 9), (14, 18)), ((14, 14), (50, 37)), ((20, 30), (10, 15))])
def test_resize_matches_torch(mode, shape):
    import torch
    import torch.nn.functional as F

    (h, w), (oh, ow) = shape
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, h, w).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(oh, ow), mode=mode, align_corners=False)
    out = ops.resize(jnp.asarray(x), (oh, ow), method=mode)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4)


def test_resize_align_corners_bilinear():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 13, 17).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(26, 51), mode="bilinear", align_corners=True)
    out = ops.resize(jnp.asarray(x), (26, 51), method="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------- morphology


def test_corrosion_matches_torch_minpool():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.rand(2, 5, 33, 41).astype(np.float32)
    k = 11
    ref = -F.max_pool2d(-torch.from_numpy(x), k, 1, k // 2)
    out = ops.corrosion(jnp.asarray(x), corr_size=k)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-6)


def test_box2mask():
    boxes = jnp.asarray([[2.0, 3.0, 5.0, 6.0]])
    m = ops.box2mask(boxes, (8, 8), default_val=0.0)
    m = np.asarray(m[0])
    assert m[3, 2] == 1 and m[6, 5] == 1  # inclusive ends (int(b)+1 crop)
    assert m[2, 2] == 0 and m[3, 1] == 0


# ---------------------------------------------------------------- CCL


def test_ccl_simple_components():
    mask = np.zeros((16, 16), np.uint8)
    mask[1:4, 1:4] = 1
    mask[8:12, 8:14] = 1
    mask[14, 0] = 1
    labels = np.asarray(ops.connected_components(jnp.asarray(mask)))
    assert labels[0, 0] == 0
    ids = set(np.unique(labels)) - {0}
    assert len(ids) == 3
    # each region uniformly labeled
    assert len(np.unique(labels[1:4, 1:4])) == 1
    assert len(np.unique(labels[8:12, 8:14])) == 1


def test_ccl_diagonal_8conn():
    mask = np.eye(10, dtype=np.uint8)
    labels = np.asarray(ops.connected_components(jnp.asarray(mask), connectivity=8))
    assert len(set(np.unique(labels)) - {0}) == 1
    labels4 = np.asarray(ops.connected_components(jnp.asarray(mask), connectivity=4))
    assert len(set(np.unique(labels4)) - {0}) == 10


def test_ccl_spiral_converges():
    # serpentine path stresses propagation depth
    mask = np.zeros((32, 32), np.uint8)
    for r in range(0, 32, 2):
        mask[r, :] = 1
        if (r // 2) % 2 == 0 and r + 1 < 32:
            mask[r + 1, -1] = 1
        elif r + 1 < 32:
            mask[r + 1, 0] = 1
    labels = np.asarray(ops.connected_components(jnp.asarray(mask)))
    assert len(set(np.unique(labels)) - {0}) == 1


# ---------------------------------------------------------------- roi_align


def _np_bilinear(feat, y, x):
    """mmcv roi_align bilinear_interpolate reference (zero outside [-1, size])."""
    c, h, w = feat.shape
    if y <= -1.0 or y >= h or x <= -1.0 or x >= w:
        return np.zeros(c, feat.dtype)
    y = max(y, 0.0)
    x = max(x, 0.0)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (
        feat[:, y0, x0] * (1 - ly) * (1 - lx)
        + feat[:, y0, x1] * (1 - ly) * lx
        + feat[:, y1, x0] * ly * (1 - lx)
        + feat[:, y1, x1] * ly * lx
    )


def _np_roi_align(feats, rois, scale, out, sr, aligned):
    n = rois.shape[0]
    c = feats.shape[1]
    res = np.zeros((n, c, out, out), np.float32)
    off = 0.5 if aligned else 0.0
    for i, roi in enumerate(rois):
        b = int(roi[0])
        x1, y1, x2, y2 = roi[1:] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out, rh / out
        for py in range(out):
            for px in range(out):
                acc = np.zeros(c, np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        yy = y1 + (py + (iy + 0.5) / sr) * bh
                        xx = x1 + (px + (ix + 0.5) / sr) * bw
                        acc += _np_bilinear(feats[b], yy, xx)
                res[i, :, py, px] = acc / (sr * sr)
    return res


def test_roi_align_matches_reference():
    rng = np.random.RandomState(3)
    feats = rng.randn(2, 8, 24, 32).astype(np.float32)
    rois = np.array(
        [
            [0, 4.0, 4.0, 100.0, 150.0],
            [1, 0.0, 0.0, 511.0, 383.0],
            [0, 33.3, 21.7, 200.1, 111.9],
        ],
        np.float32,
    )
    ref = _np_roi_align(feats, rois, 1 / 16, 7, 2, True)
    out = ops.roi_align(jnp.asarray(feats), jnp.asarray(rois), 1 / 16, 7, 2, True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)

    # B == 1 takes the gather-free shared-feature-map matmul branch
    f1 = feats[:1]
    r1 = rois.copy()
    r1[:, 0] = 0
    ref1 = _np_roi_align(f1, r1, 1 / 16, 7, 2, True)
    out1 = ops.roi_align(jnp.asarray(f1), jnp.asarray(r1), 1 / 16, 7, 2, True)
    np.testing.assert_allclose(np.asarray(out1), ref1, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------- point_sample


def test_point_sample_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    feats = rng.randn(3, 6, 14, 14).astype(np.float32)
    pts = rng.rand(3, 20, 2).astype(np.float32)  # [0,1] xy
    grid = torch.from_numpy(pts * 2 - 1).unsqueeze(2)  # (N,P,1,2)
    ref = F.grid_sample(torch.from_numpy(feats), grid, align_corners=False).squeeze(-1)
    out = ops.point_sample(jnp.asarray(feats), jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- nms


def _np_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        wh = np.maximum(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-10)
        alive &= iou <= thr
    return np.array(keep)


def test_nms_matches_reference():
    rng = np.random.RandomState(5)
    n = 200
    xy = rng.rand(n, 2) * 100
    wh = rng.rand(n, 2) * 50 + 1
    boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    ref = _np_nms(boxes, scores, 0.5)
    idx, valid = ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=n)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, ref)


def test_paste_masks_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(6)
    masks = rng.rand(2, 28, 28).astype(np.float32)
    boxes = np.array([[10.0, 12.0, 50.0, 70.0], [0.0, 0.0, 30.0, 20.0]], np.float32)
    img_h, img_w = 80, 90

    # torch reference = detectron2-style paste (grid_sample, align_corners=False)
    x0, y0, x1, y1 = [torch.from_numpy(boxes[:, i : i + 1]) for i in range(4)]
    img_y = torch.arange(img_h, dtype=torch.float32) + 0.5
    img_x = torch.arange(img_w, dtype=torch.float32) + 0.5
    gy = (img_y[None] - y0) / (y1 - y0) * 2 - 1
    gx = (img_x[None] - x0) / (x1 - x0) * 2 - 1
    gxe = gx[:, None, :].expand(2, img_h, img_w)
    gye = gy[:, :, None].expand(2, img_h, img_w)
    grid = torch.stack([gxe, gye], dim=3)
    ref = F.grid_sample(
        torch.from_numpy(masks)[:, None], grid, align_corners=False
    ).squeeze(1)

    out = ops.paste_masks(jnp.asarray(masks), jnp.asarray(boxes), img_h, img_w)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------- LSA


@pytest.mark.parametrize("n,m,seed", [(5, 10, 0), (20, 100, 1), (1, 7, 2), (16, 16, 3)])
def test_lsa_matches_scipy(n, m, seed):
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    rng = np.random.RandomState(seed)
    cost = rng.rand(n, m).astype(np.float32) * 10
    rows, cols = scipy_lsa(cost)
    got = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    # optimal value must match (assignment itself may differ on ties)
    assert np.isclose(cost[np.arange(n), got].sum(), cost[rows, cols].sum(), atol=1e-4)
    assert len(np.unique(got)) == n  # one-to-one


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lsa_row_valid_skip(seed):
    """row_valid-skipped solve equals the valid-submatrix optimum."""
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    rng = np.random.RandomState(seed)
    n, m = 20, 100
    cost = rng.rand(n, m).astype(np.float32) * 10
    valid = rng.rand(n) < 0.4
    valid[0] = True  # at least one
    got = np.asarray(
        linear_sum_assignment(jnp.asarray(cost), row_valid=jnp.asarray(valid))
    )
    sub = cost[valid]
    rows, cols = scipy_lsa(sub)
    vg = got[valid]
    assert (vg >= 0).all() and len(np.unique(vg)) == valid.sum()
    assert np.isclose(
        cost[valid][np.arange(valid.sum()), vg].sum(), sub[rows, cols].sum(),
        atol=1e-4,
    )


def test_connected_components_batch_fallback_matches_single():
    import numpy as np
    from scipy import ndimage

    from attentionshift_tpu.ops.ccl import (
        connected_components,
        connected_components_batch,
    )

    rng = np.random.RandomState(3)
    masks = np.stack(
        [ndimage.gaussian_filter(rng.rand(32, 48), 3) > 0.5 for _ in range(5)]
    )
    batch = np.asarray(connected_components_batch(jnp.asarray(masks)))
    for i in range(5):
        single = np.asarray(connected_components(jnp.asarray(masks[i])))
        np.testing.assert_array_equal(batch[i], single)


def test_connected_components_batch_large_plane_vmem_guard():
    """Planes too large for the VMEM-resident Pallas fixpoint (cam_stride<=2
    at 800x1344) must stream through the XLA path instead of tripping
    Mosaic's scoped-vmem stack limit — with identical (min-flat-index)
    labels. The guard returns before pallas_call, so this runs anywhere."""
    import numpy as np
    from scipy import ndimage

    from attentionshift_tpu.ops.ccl import (
        connected_components,
        connected_components_batch,
    )

    rng = np.random.RandomState(5)
    # one plane over the ~218k-cell budget (10MB scoped stack / 12
    # temporaries), plus the transposed-orientation case
    for h, w in [(460, 500), (500, 460)]:
        masks = np.stack(
            [ndimage.gaussian_filter(rng.rand(h, w), 9) > 0.5 for _ in range(2)]
        )
        got = np.asarray(
            connected_components_batch(jnp.asarray(masks), use_pallas=True)
        )
        for i in range(2):
            want = np.asarray(connected_components(jnp.asarray(masks[i])))
            np.testing.assert_array_equal(got[i], want)


def test_ccl_batch_pallas_parity_at_bench_plane():
    """Pallas batch CCL vs the XLA path at the exact bench plane
    geometry (100x168, the transposed-orientation branch)."""
    from unittest import mock

    import jax.experimental.pallas as pl

    import jax

    from attentionshift_tpu.ops import ccl

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    rng = np.random.RandomState(0)
    masks = np.zeros((6, 100, 168), bool)
    for i in range(6):
        for _ in range(3):
            r, c = rng.randint(10, 90), rng.randint(10, 150)
            masks[i, r - 7:r + 7, c - 9:c + 9] = True
    want = jax.vmap(lambda m: ccl.connected_components(m, 8, 64))(
        jnp.asarray(masks))
    with mock.patch.object(pl, "pallas_call", interp):
        got = ccl.connected_components_batch(
            jnp.asarray(masks), 8, 64, use_pallas=True)
    assert np.array_equal(np.asarray(want), np.asarray(got))


def test_nms_fixpoint_matches_sequential_greedy():
    """The round-4 suppression-fixpoint NMS must reproduce sequential
    greedy argmax NMS exactly — kept set, order, validity — including
    score ties (first index wins) and invalid candidates."""
    from attentionshift_tpu.ops.nms import box_iou, nms

    def greedy_ref(boxes, scores, thr, max_out, valid):
        alive = valid.copy()
        iou = np.asarray(box_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
        keep = np.zeros(max_out, np.int32)
        kv = np.zeros(max_out, bool)
        for i in range(max_out):
            masked = np.where(alive, scores, -np.inf)
            b = int(np.argmax(masked))
            if masked[b] == -np.inf:
                break
            keep[i], kv[i] = b, True
            alive &= ~(iou[b] > thr)
            alive[b] = False
        return keep, kv

    rng = np.random.RandomState(0)
    for trial in range(25):
        n = rng.randint(5, 120)
        wh = np.abs(rng.randn(n, 4).astype(np.float32)) * 30
        boxes = np.stack([wh[:, 0], wh[:, 1], wh[:, 0] + wh[:, 2] + 1,
                          wh[:, 1] + wh[:, 3] + 1], 1)
        scores = rng.rand(n).astype(np.float32)
        if trial % 3 == 0:
            scores = np.round(scores, 1)  # force ties
        valid = rng.rand(n) > 0.2
        mo = rng.randint(1, n + 5)
        thr = float(rng.choice([0.3, 0.5, 0.7]))
        ki, kv = nms(jnp.asarray(boxes), jnp.asarray(scores), thr, mo,
                     jnp.asarray(valid))
        rk, rv = greedy_ref(boxes, scores, thr, mo, valid.copy())
        assert np.array_equal(np.asarray(kv), rv), trial
        assert np.array_equal(np.asarray(ki)[rv], rk[rv]), trial


# ---------------------------------------------------------------- top_k_set
def test_top_k_set_matches_lax_top_k():
    """Exact-set parity with lax.top_k (incl. duplicate scores: ties at
    the k-th value resolve to lowest indices), across sizes/k."""
    import jax

    from attentionshift_tpu.ops.topk import top_k_set

    rng = np.random.RandomState(0)
    for n, k in [(50, 5), (1000, 100), (4096, 2000), (20000, 512)]:
        for trial in range(3):
            if trial == 2:
                # heavy ties: quantised scores force k-th-value ties
                s = np.round(rng.rand(n) * 8) / 8.0
            else:
                s = rng.randn(n)
            s = jnp.asarray(s, jnp.float32)
            vals, idx = top_k_set(s, k)
            ref_v, ref_i = jax.lax.top_k(s, k)
            assert sorted(np.asarray(idx).tolist()) == sorted(
                np.asarray(ref_i).tolist()
            ), (n, k, trial)
            np.testing.assert_allclose(
                np.sort(np.asarray(vals)), np.sort(np.asarray(ref_v))
            )
            # ascending index order, values consistent with indices
            assert (np.diff(np.asarray(idx)) > 0).all()
            np.testing.assert_array_equal(
                np.asarray(vals), np.asarray(s)[np.asarray(idx)]
            )


def test_top_k_set_negative_and_full():
    import jax

    from attentionshift_tpu.ops.topk import top_k_set

    s = jnp.asarray([-5.0, -1.0, -3.0, -2.0], jnp.float32)
    vals, idx = top_k_set(s, 2)
    ref_v, ref_i = jax.lax.top_k(s, 2)
    assert sorted(np.asarray(idx).tolist()) == sorted(np.asarray(ref_i).tolist())
    # k == n passes through
    vals, idx = top_k_set(s, 4)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(4))
