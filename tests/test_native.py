"""Tests for the native (C++) RLE mask toolkit."""

import numpy as np
import pytest

from attentionshift_tpu import native


def test_native_builds():
    assert native.native_available(), "g++ build of maskapi.so failed"


def _rand_mask(seed, h=37, w=53):
    rng = np.random.RandomState(seed)
    from scipy import ndimage

    return ndimage.gaussian_filter(rng.rand(h, w), 3) > 0.5


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rle_roundtrip(seed):
    m = _rand_mask(seed)
    rle = native.rle_encode(m)
    back = native.rle_decode(rle)
    np.testing.assert_array_equal(back, m)
    assert native.rle_area(rle) == m.sum()


def test_rle_empty_and_full():
    z = np.zeros((8, 6), bool)
    f = np.ones((8, 6), bool)
    for m in (z, f):
        np.testing.assert_array_equal(native.rle_decode(native.rle_encode(m)), m)
    assert native.rle_area(native.rle_encode(z)) == 0
    assert native.rle_area(native.rle_encode(f)) == 48


def test_rle_iou_matrix_matches_dense():
    masks_a = [_rand_mask(i) for i in range(3)]
    masks_b = [_rand_mask(i + 10) for i in range(4)]
    ra = [native.rle_encode(m) for m in masks_a]
    rb = [native.rle_encode(m) for m in masks_b]
    got = native.rle_iou_matrix(ra, rb)

    a = np.stack(masks_a).reshape(3, -1).astype(np.float64)
    b = np.stack(masks_b).reshape(4, -1).astype(np.float64)
    inter = a @ b.T
    union = a.sum(1)[:, None] + b.sum(1)[None] - inter
    want = inter / np.maximum(union, 1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rle_string_roundtrip():
    m = _rand_mask(5)
    rle = native.rle_encode(m)
    s = native.rle_to_string(rle)
    assert isinstance(s, bytes) and len(s) > 0
    back = native.rle_from_string(s, rle["size"])
    np.testing.assert_array_equal(
        np.asarray(back["counts"], np.int64), np.asarray(rle["counts"], np.int64)
    )
    np.testing.assert_array_equal(native.rle_decode(back), m)


def test_rle_string_coco_compat():
    """Spot-check against a pycocotools-produced pair (captured offline):
    a 3x3 mask with one fg pixel at (0, 1) in Fortran order ->
    counts [3, 1, 5]."""
    m = np.zeros((3, 3), bool)
    m[0, 1] = True
    rle = native.rle_encode(m)
    np.testing.assert_array_equal(np.asarray(rle["counts"]), [3, 1, 5])


def test_polygon_rasterize_square():
    # axis-aligned square [2, 2] - [8, 8]
    mask = native.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 12)
    assert mask[5, 5]
    assert not mask[0, 0]
    assert not mask[9, 9]
    # area approximately 6x6
    assert abs(int(mask.sum()) - 36) <= 12


def test_polygon_rasterize_triangle_and_holes():
    tri = [[0, 0, 10, 0, 0, 10]]
    mask = native.polygons_to_mask(tri, 10, 10)
    assert mask[1, 1]
    assert not mask[9, 9]
    # two disjoint polygons union
    two = [[0, 0, 4, 0, 4, 4, 0, 4], [6, 6, 9, 6, 9, 9, 6, 9]]
    m2 = native.polygons_to_mask(two, 10, 10)
    assert m2[2, 2] and m2[7, 7] and not m2[5, 5]
