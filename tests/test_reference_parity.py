"""Direct numerical parity against the reference implementation.

These tests load the reference's pure-torch free functions straight out
of ``/root/reference/mmdet/models/roi_heads/
stdroi_point_deform_attn_reppoints.py`` (AST extraction at test time —
no mmcv/mmdet import chain, CUDA connected components stubbed with a
host labeler) and run them on tiny random inputs as oracles for our
fixed-shape jax rebuilds. This is a stronger check than the hand-written
oracles elsewhere in the suite: the oracle *is* the reference code.

Skipped entirely when the reference tree is not mounted.
"""

from __future__ import annotations

import ast
import math
import random
import types
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REF_FILE = Path(
    "/root/reference/mmdet/models/roi_heads/"
    "stdroi_point_deform_attn_reppoints.py"
)

pytestmark = pytest.mark.skipif(
    not REF_FILE.exists(), reason="reference tree not mounted"
)

# reference free functions / methods exercised as oracles
_NAMES = [
    "attns_project_to_feature",
    "idx_by_coords",
    "box2mask",
    "norm_attns",
    "normalize_map",
    "decouple_instance",
    "get_point_cos_similarity_map",
    "get_refined_similarity",
    "get_cosine_similarity_refined_map",
    "sample_point_grid",
    "cosine_shift_batch",
    "update_density_batch",
    "fill_in_idx",
    "mean_shift_grid_prototype",
    "get_semantic_centers",
    "filter_maps",
    "merge_maps",
    "cal_similarity",
    "get_center_coord_with_feat",
    "get_bbox_from_cam_fast",
    "corrosion",
    "corrosion_batch",
    "expension",
    "get_point_coords_wrt_box",
    "extract_bg_coords",
    "get_refined_similarity_input_map",
    "update_fg_map_single_v3",
    "update_fg_map",
]


def _host_ccl(x: "torch.Tensor") -> "torch.Tensor":
    """cc_torch.connected_components_labeling stand-in (8-connectivity).

    Label values differ from the CUDA kernel's, but component membership
    and the 0=background convention — all the caller consumes — match.
    scipy's C labeler when available (needed at the realistic 800x1344
    scale); the pure-python flood fill otherwise. Both number components
    in raster first-encounter order.
    """
    a = x.cpu().numpy().astype(bool)
    try:
        from scipy import ndimage

        labels, _ = ndimage.label(a, structure=np.ones((3, 3), bool))
        return torch.from_numpy(labels.astype(np.int64))
    except ImportError:
        pass
    h, w = a.shape
    labels = np.zeros((h, w), np.int64)
    cur = 0
    for i in range(h):
        for j in range(w):
            if a[i, j] and labels[i, j] == 0:
                cur += 1
                stack = [(i, j)]
                labels[i, j] = cur
                while stack:
                    r, c = stack.pop()
                    for dr in (-1, 0, 1):
                        for dc in (-1, 0, 1):
                            rr, cc = r + dr, c + dc
                            if (
                                0 <= rr < h
                                and 0 <= cc < w
                                and a[rr, cc]
                                and labels[rr, cc] == 0
                            ):
                                labels[rr, cc] = cur
                                stack.append((rr, cc))
    return torch.from_numpy(labels)


def _point_sample(input, points, align_corners=False, **kwargs):
    """``mmcv.ops.point_sample`` stand-in: grid_sample over [0, 1] coords."""
    add_dim = False
    if points.dim() == 3:
        add_dim = True
        points = points.unsqueeze(2)
    output = F.grid_sample(
        input, 2.0 * points - 1.0, align_corners=align_corners, **kwargs
    )
    if add_dim:
        output = output.squeeze(3)
    return output


@pytest.fixture(scope="module")
def ref():
    """Extract the reference functions by name and exec them with torch."""
    tree = ast.parse(REF_FILE.read_text())
    defs: dict[str, ast.FunctionDef] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef):
            defs[node.name] = node  # later defs win, like module exec
    missing = [n for n in _NAMES if n not in defs]
    assert not missing, f"reference functions not found: {missing}"
    body = []
    for n in _NAMES:
        fn = defs[n]
        fn.decorator_list = []  # strip mmcv decorators (not importable)
        body.append(fn)
    code = compile(
        ast.fix_missing_locations(ast.Module(body=body, type_ignores=[])),
        str(REF_FILE),
        "exec",
    )
    ns: dict = dict(
        torch=torch,
        nn=nn,
        F=F,
        np=np,
        math=math,
        random=random,
        connected_components_labeling=_host_ccl,
        point_sample=_point_sample,
    )
    exec(code, ns)
    return types.SimpleNamespace(**ns), ns


def _t(x) -> "torch.Tensor":
    return torch.from_numpy(np.asarray(x, np.float32))


def _j(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# attention rollout


def test_rollout_point_rows_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.rollout import attention_rollout_point_rows

    rng = np.random.RandomState(0)
    L, B, T, P = 5, 2, 17, 4
    attns = rng.rand(L, B, T, T).astype(np.float32)
    attns /= attns.sum(-1, keepdims=True)

    ref_out = r.attns_project_to_feature(list(_t(attns)))  # (B, L, T, T)
    ours = attention_rollout_point_rows(_j(attns), P)  # (L, B, P, T)
    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(ours[i]),
            ref_out[:, i, -P:, :].numpy(),
            rtol=1e-5,
            atol=1e-6,
        )


# ---------------------------------------------------------------------------
# Stage B: refined similarity maps


def _grid_points(rng, g, k, h, w):
    """Random full-res xy points strictly inside the image."""
    xy = np.stack(
        [rng.randint(0, w - 1, (g, k)), rng.randint(0, h - 1, (g, k))],
        axis=-1,
    ).astype(np.float32)
    return xy


def test_refined_similarity_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.refine import refined_similarity

    rng = np.random.RandomState(1)
    D, Hp, Wp, G, K = 16, 9, 11, 3, 5
    H, W = Hp * 16, Wp * 16
    feats = rng.randn(D, Hp, Wp).astype(np.float32)
    boxes = np.asarray(
        [[10, 20, 100, 120], [40, 8, 170, 90], [5, 60, 140, 140]], np.float32
    )
    pts = _grid_points(rng, G + 1, K, H, W)

    for is_select in (True, False):
        ref_stack, ref_proto = r.get_refined_similarity(
            _t(pts), _t(feats)[None], bboxes=_t(boxes),
            refine_times=2, tau=0.85, is_select=is_select,
        )
        ours_map, ours_proto = refined_similarity(
            _j(pts), _j(feats), _j(boxes), num_box_maps=G,
            refine_times=2, tau=0.85, is_select=is_select,
            valid=jnp.ones((G + 1,), bool),
        )
        np.testing.assert_allclose(
            np.asarray(ours_map), ref_stack[-1].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ours_proto),
            ref_proto[:, :, 0, 0].numpy(),
            rtol=1e-4,
            atol=1e-5,
        )


def test_stage_b_full_chain_parity(ref):
    """get_cosine_similarity_refined_map vs ours, identical seed points."""
    r, ns = ref
    from attentionshift_tpu.pseudo.refine import cosine_similarity_refined_map

    rng = np.random.RandomState(2)
    D, Hp, Wp, G, K = 12, 8, 10, 2, 6
    H, W = Hp * 16, Wp * 16
    cams = rng.rand(G, H, W).astype(np.float32)
    feats = rng.randn(D, Hp, Wp).astype(np.float32)
    boxes = np.asarray([[16, 16, 120, 110], [30, 40, 150, 125]], np.float32)
    pts_fg = _grid_points(rng, G + 1, K, H, W)  # last row = bg support
    pts_bg = _grid_points(rng, G, K, H, W)

    # drive the reference with deterministic seed points
    calls = {"n": 0}

    def fake_sample_point_grid(maps, num_points=10, thr=0.2, is_pos=False,
                               gt_points=None):
        if is_pos:
            return _t(pts_fg[:G])
        if maps.shape[0] == G:  # per-instance bg draw
            return _t(pts_bg)
        calls["n"] += 1
        return _t(pts_fg[G:])  # mean-map bg support row

    old = ns["sample_point_grid"]
    ns["sample_point_grid"] = fake_sample_point_grid
    try:
        ref_fg, ref_bg, *_ = r.get_cosine_similarity_refined_map(
            _t(cams), _t(feats), _t(boxes),
            thr_pos=0.2, thr_neg=0.1, num_points=K,
            refine_times=2, obj_tau=0.9,
        )
    finally:
        ns["sample_point_grid"] = old
    assert calls["n"] == 1

    ours = cosine_similarity_refined_map(
        jax.random.PRNGKey(0), _j(cams), _j(feats), _j(boxes),
        gt_points=jnp.zeros((G, 2)), valid=jnp.ones((G,), bool),
        thr_pos=0.2, thr_neg=0.1, num_points=K, refine_times=2, obj_tau=0.9,
        points_override=(_j(pts_fg), _j(pts_bg)),
    )
    np.testing.assert_allclose(
        np.asarray(ours.map_fg), ref_fg[-1].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.map_bg), ref_bg[-1].numpy(), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# Stage C: mean shift / filtering / merging / centres


def test_cosine_shift_batch_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.meanshift import cosine_shift_batch

    rng = np.random.RandomState(3)
    G, K, N, D = 2, 4, 30, 8
    # features near a shared direction: keeps the reference's softmax
    # weights out of the deep-subnormal regime (where torch itself
    # flushes to zero and assignment information is lost for both)
    base = rng.randn(D).astype(np.float32)
    feats = base + 0.45 * rng.randn(G, N, D).astype(np.float32)
    prot = feats[:, rng.choice(N, K, replace=False), :]
    feats_org = (base + 0.45 * rng.randn(N, D)).astype(np.float32)

    ref_prot, ref_sim = r.cosine_shift_batch(
        _t(prot), _t(feats), _t(feats_org), tau=0.1, temp=0.1, n_shift=3
    )
    ours_prot, ours_sim = cosine_shift_batch(
        _j(prot), _j(feats), _j(feats_org), tau=0.1, temp=0.1, n_shift=3
    )
    np.testing.assert_allclose(
        np.asarray(ours_prot).reshape(G * K, D), ref_prot.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours_sim).reshape(G * K, N), ref_sim.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_mean_shift_grid_prototype_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.meanshift import mean_shift_grid_prototype

    rng = np.random.RandomState(4)
    D, Hp, Wp, G, K = 8, 7, 9, 3, 5
    base = rng.randn(D, 1, 1).astype(np.float32)
    feats = (base + 0.45 * rng.randn(D, Hp, Wp)).astype(np.float32)
    # instance 0: plenty of fg; instance 1: fewer than K fg; instance 2: none
    maps = np.zeros((G, Hp, Wp), np.float32)
    maps[0, 1:5, 2:7] = 1.0
    maps[1, 3, 4] = 1.0
    maps[1, 5, 1] = 1.0
    rois = np.asarray(
        [[16, 16, 100, 90], [20, 40, 120, 100], [32, 16, 112, 80]], np.float32
    )

    ref_prot, ref_sim = r.mean_shift_grid_prototype(
        None, _t(maps), _t(feats), _t(rois),
        thr=0.35, n_shift=3, tau=0.1, temp=0.1, n_points=K,
    )
    ours_prot, ours_sim = mean_shift_grid_prototype(
        _j(maps), _j(feats), _j(rois), thr=0.35, n_shift=3,
        tau=0.1, temp=0.1, n_points=K,
    )
    np.testing.assert_allclose(
        np.asarray(ours_prot).reshape(G * K, D), ref_prot.numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours_sim).reshape(G * K, Hp, Wp), ref_sim.numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_filter_merge_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.meanshift import filter_maps, merge_maps

    rng = np.random.RandomState(5)
    G, K, Hp, Wp, D = 2, 6, 7, 9, 8
    sim = rng.rand(G, K, Hp, Wp).astype(np.float32)
    fg = rng.rand(G, Hp, Wp).astype(np.float32)
    prot = rng.randn(G, K, D).astype(np.float32)
    # force some near-duplicate prototypes to exercise merging
    prot[0, 3] = prot[0, 1] * 1.02
    prot[1, 4] = prot[1, 0] * 0.98

    _, ref_idx = r.filter_maps(_t(sim), _t(fg), _t(fg), pos_thr=0.5)
    ours_keep = filter_maps(_j(sim), _j(fg), pos_thr=0.5)
    np.testing.assert_array_equal(np.asarray(ours_keep), ref_idx.numpy())

    split = ref_idx.sum(dim=-1).tolist()
    ref_merged = r.merge_maps(
        list(_t(prot).flatten(0, 1)[ref_idx.flatten()].split(split, dim=0)),
        thr=0.85,
    )
    ours_merged, ours_valid = merge_maps(_j(prot), ours_keep, thr=0.85)
    for g in range(G):
        got = np.asarray(ours_merged[g])[np.asarray(ours_valid[g])]
        want = (
            ref_merged[g].numpy()
            if len(ref_merged[g]) > 0
            else np.zeros((0, D), np.float32)
        )
        assert got.shape == want.shape
        # ours keeps merged rows at the group-leader slot (ascending),
        # reference appends in the same leader order
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_semantic_centers_full_stage_c_parity(ref):
    """Full get_semantic_centers driver vs ours (deterministic path)."""
    r, _ = ref
    from attentionshift_tpu.pseudo.meanshift import semantic_centers

    rng = np.random.RandomState(6)
    D, Hp, Wp, G = 8, 8, 10, 2
    H, W = Hp * 16, Wp * 16
    # mildly clustered features around a shared direction: separated
    # parts without pushing the reference's softmax into deep subnormals
    base = rng.randn(D, 1, 1).astype(np.float32)
    feats = (base + 0.3 * rng.randn(D, Hp, Wp)).astype(np.float32)
    feats[:, 1:4, 1:4] += 0.5 * rng.randn(D, 1, 1).astype(np.float32)
    feats[:, 5:7, 6:9] += 0.5 * rng.randn(D, 1, 1).astype(np.float32)
    feats[:, 1:3, 6:9] += 0.5 * rng.randn(D, 1, 1).astype(np.float32)
    map_fg = np.zeros((G, H, W), np.float32)
    map_fg[0, 8:64, 8:64] = 1.0
    map_fg[0, 70:112, 90:140] = 1.0
    map_fg[1, 16:48, 96:144] = 1.0
    map_bg = rng.rand(G, H, W).astype(np.float32) * 0.3
    rois = np.asarray([[0, 0, 150, 120], [80, 8, 158, 60]], np.float32)
    labels = np.asarray([3, 7], np.int64)

    shim = types.SimpleNamespace()
    shim.mean_shift_grid_prototype = types.MethodType(
        r.mean_shift_grid_prototype, shim
    )
    outs = r.get_semantic_centers(
        shim, _t(map_fg), _t(map_bg), _t(rois), _t(feats),
        pos_thr=0.35, refine_times=3, gt_labels=torch.from_numpy(labels),
        merge_thr=0.85, num_semantic_points=3,
    )
    # outs: ([coords, labels], coord_split, sim_fg, feat_split, feats,
    #        num_parts, coords_org, labels_org, corres_gt)
    coords_org, labels_org, corres_gt = outs[6], outs[7], outs[8]

    ours = semantic_centers(
        _j(map_fg), _j(map_bg), _j(rois), _j(feats),
        jnp.asarray(labels), jnp.ones((G,), bool),
        pos_thr=0.35, n_shift=3, merge_thr=0.85, num_semantic_points=3,
    )
    for g in range(G):
        want = coords_org.numpy()[corres_gt.numpy() == g]
        got = np.asarray(ours.coords[g])[np.asarray(ours.part_valid[g])]
        assert got.shape == want.shape, (
            f"instance {g}: {got.shape} vs {want.shape}"
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Stage A: CAM -> box


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bbox_from_cam_parity(ref, seed):
    r, _ = ref
    from attentionshift_tpu.pseudo.cam import bbox_from_cam

    rng = np.random.RandomState(seed)
    H, W = 24, 32
    # blobby cam: a few gaussian bumps
    yy, xx = np.mgrid[0:H, 0:W]
    cam = np.zeros((H, W), np.float32)
    for _ in range(3):
        cy, cx = rng.randint(0, H), rng.randint(0, W)
        s = rng.uniform(1.5, 4.0)
        cam += rng.uniform(0.3, 1.0) * np.exp(
            -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)
        ).astype(np.float32)
    point = np.asarray(
        [rng.uniform(2, W - 2), rng.uniform(2, H - 2)], np.float32
    )

    ref_box, _ = r.get_bbox_from_cam_fast(
        _t(cam.copy()), _t(point), cam_thr=0.2, area_ratio=0.5,
        img_size=(H, W), box_method="expand",
    )
    ours = bbox_from_cam(_j(cam), _j(point), cam_thr=0.2, area_ratio=0.5)
    np.testing.assert_allclose(
        np.asarray(ours), ref_box[0].numpy(), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------------------
# small utilities


def test_corrosion_expansion_parity(ref):
    r, _ = ref
    from attentionshift_tpu.ops.masks import corrosion, expansion

    rng = np.random.RandomState(7)
    x = (rng.rand(3, 20, 24) > 0.5).astype(np.float32)
    ref_c = r.corrosion_batch(_t(x)[None], corr_size=5)[0]
    np.testing.assert_allclose(np.asarray(corrosion(_j(x), 5)), ref_c.numpy())
    ref_e = r.expension(_t(x)[None], expn_size=5)[0]
    np.testing.assert_allclose(np.asarray(expansion(_j(x), 5)), ref_e.numpy())


def test_norm_decouple_parity(ref):
    r, _ = ref
    from attentionshift_tpu.pseudo.cam import norm_attns
    from attentionshift_tpu.pseudo.refine import decouple_instance, normalize_map

    rng = np.random.RandomState(8)
    m = rng.rand(4, 12, 14).astype(np.float32) + 0.1
    np.testing.assert_allclose(
        np.asarray(norm_attns(_j(m))), r.norm_attns(_t(m)).numpy(),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(normalize_map(_j(m))), r.normalize_map(_t(m)).numpy(),
        rtol=1e-6, atol=1e-6,
    )
    fg = rng.rand(4, 12, 14).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(decouple_instance(_j(m), _j(fg))),
        r.decouple_instance(_t(m), _t(fg)).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_strided_seed_selection_parity(ref):
    """strided_in_mask == the reference's grid + fill_in_idx rule."""
    r, _ = ref
    from attentionshift_tpu.pseudo.points import strided_in_mask

    rng = np.random.RandomState(9)
    for n_points in (5, 8):
        for trial in range(6):
            mask = rng.rand(9, 11) > rng.uniform(0.3, 0.97)
            if mask.sum() == 0:
                continue
            coords_t = torch.from_numpy(np.asarray(mask)).nonzero()
            num_pos = coords_t.shape[0]
            if num_pos >= n_points:
                grid = torch.arange(0, num_pos, step=num_pos // n_points)
                want = coords_t[grid][:n_points]
            else:
                want = r.fill_in_idx(coords_t, n_points)
            got, n = strided_in_mask(jnp.asarray(mask), n_points)
            assert int(n) == num_pos
            np.testing.assert_array_equal(
                np.asarray(got), want.numpy()[:n_points]
            )


def test_point_coords_wrt_box_parity(ref):
    r, _ = ref
    from attentionshift_tpu.core.boxes import point_coords_wrt_box

    rng = np.random.RandomState(10)
    boxes = np.asarray([[10, 20, 110, 90], [0, 0, 64, 48]], np.float32)
    pts = rng.uniform(0, 120, (2, 7, 2)).astype(np.float32)
    want = r.get_point_coords_wrt_box(_t(boxes), _t(pts)).numpy()
    got = np.asarray(point_coords_wrt_box(_j(boxes), _j(pts)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Composed pipeline: Stage A -> B -> C end-to-end (frozen-fixture pack)


@pytest.mark.slow
@pytest.mark.parametrize(
    "hp,wp,blob_rc",
    [
        (12, 12, ((3, 3), (8, 4), (5, 9))),
        pytest.param(
            10, 17, ((3, 4), (7, 6), (5, 13)),
            marks=[pytest.mark.slow, pytest.mark.medium],
            id="nonsquare-800x1344-aspect",
        ),
    ],
)
def test_composed_seed_pipeline_parity(ref, hp, wp, blob_rc):
    """The COMPOSED seed_pseudo_gt chain, reference vs ours.

    Earlier tests verify each stage in isolation; this one threads one
    set of structured attention maps through the full engine on both
    sides — rollout -> CAM slice/upsample -> CCL box extraction ->
    (fixed MIL choice) -> Stage-B refined maps -> binary pseudo masks ->
    Stage-C semantic centers — composing the extracted reference
    functions exactly as ``seed_pseudo_gt`` does
    (`stdroi:2259-2363`, `get_cosine_similarity_refined_map:1000-1019`,
    `get_semantic_centers:1995-2031`) against our composed engine
    (``attention_rollout_point_rows`` -> ``candidate_boxes`` ->
    ``masks_and_centers``). The only injected noise source is the
    Stage-B seed sampling, which the reference performs (torch RNG) and
    both sides then share via ``points_override``.
    """
    r, _ = ref
    from attentionshift_tpu.ops.image import resize
    from attentionshift_tpu.pseudo.engine import candidate_boxes, masks_and_centers
    from attentionshift_tpu.pseudo.rollout import attention_rollout_point_rows

    rng = np.random.RandomState(11)
    L, P, G, D = 4, 10, 3, 16
    Hp, Wp = hp, wp  # second variant: 10x17, the 800x1344 aspect ratio
    H, W = Hp * 16, Wp * 16
    N = Hp * Wp
    T = 1 + N + P

    # --- structured attention: the assigned point tokens' rows carry a
    # gaussian blob over the patch grid; everything else is noise
    assigned = np.asarray([1, 4, 7], np.int64)
    # blob_rc: patch-grid (row, col) per gt
    yy, xx = np.mgrid[0:Hp, 0:Wp]
    attns = np.zeros((L, 1, T, T), np.float32)
    for l in range(L):
        logits = rng.randn(T, T).astype(np.float32) * 0.3
        for g, (br, bc) in enumerate(blob_rc):
            bump = 6.0 * np.exp(-((yy - br) ** 2 + (xx - bc) ** 2) / (2 * 2.2**2))
            logits[1 + N + assigned[g], 1 : 1 + N] += bump.reshape(-1)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        attns[l, 0] = e / e.sum(-1, keepdims=True)

    gt_points = np.asarray(
        [[bc * 16 + 8.0, br * 16 + 8.0] for br, bc in blob_rc], np.float32
    )  # full-res xy at the blob centres
    gt_labels = np.asarray([2, 5, 9], np.int64)

    # features: shared direction + per-blob-region parts (keeps the
    # reference's softmax out of deep subnormals, see cosine_shift test)
    base = rng.randn(D, 1, 1).astype(np.float32)
    feats = (base + 0.3 * rng.randn(D, Hp, Wp)).astype(np.float32)
    for br, bc in blob_rc:
        feats[:, max(br - 2, 0) : br + 1, max(bc - 2, 0) : bc + 1] += (
            0.5 * rng.randn(D, 1, 1).astype(np.float32)
        )
        feats[:, br : br + 3, bc : bc + 3] += 0.5 * rng.randn(D, 1, 1).astype(
            np.float32
        )

    # ---------------- reference chain
    joint = r.attns_project_to_feature(list(_t(attns)))  # (B, L, T, T)
    rows_ref = joint[0][:, -P:, 1 : 1 + N]  # (L, P, N)
    cams_ref = rows_ref[:, torch.from_numpy(assigned), :].reshape(L * G, 1, Hp, Wp)
    cams_up_ref = F.interpolate(
        cams_ref, (H, W), mode="bilinear"
    ).reshape(L, G, H, W)
    boxes_ref = np.zeros((G, L, 4), np.float32)
    for l in range(L):
        for g in range(G):
            bb, _ = r.get_bbox_from_cam_fast(
                cams_up_ref[l, g].clone(), _t(gt_points[g]), cam_thr=0.2,
                area_ratio=0.5, img_size=(H, W), box_method="expand",
            )
            boxes_ref[g, l] = bb[0].numpy()

    best_idx = np.asarray([0, 2, 1])  # stand-in for the (learned) MIL pick
    best_boxes_ref = boxes_ref[np.arange(G), best_idx]  # (G, 4)
    best_cams_ref = torch.stack(
        [cams_up_ref[best_idx[g], g] for g in range(G)]
    )  # (G, H, W)

    torch.manual_seed(0)
    gt_points_yx = _t(gt_points[:, ::-1].copy())  # sampler uses (y, x) pre-flip
    ref_fg, ref_bg, pts_fg, pts_bg, *_ = r.get_cosine_similarity_refined_map(
        best_cams_ref.clone(), _t(feats), _t(best_boxes_ref),
        thr_pos=0.2, thr_neg=0.1, num_points=20, refine_times=2, obj_tau=0.9,
        gt_points=gt_points_yx,
    )
    ref_masks = (ref_fg[-1] > 0.35).numpy().astype(np.uint8)  # `stdroi:2356-2358`

    shim = types.SimpleNamespace()
    shim.mean_shift_grid_prototype = types.MethodType(
        r.mean_shift_grid_prototype, shim
    )
    outs = r.get_semantic_centers(
        shim, ref_fg[-1].clone(), ref_bg[-1].clone(), _t(best_boxes_ref), _t(feats),
        pos_thr=0.35, refine_times=10, gt_labels=torch.from_numpy(gt_labels),
        merge_thr=0.85, num_semantic_points=5,
    )
    coords_org, corres_gt = outs[6], outs[8]

    # ---------------- our composed engine
    rollout = attention_rollout_point_rows(_j(attns), P)  # (L, B, P, T)
    cand, cams_patch = candidate_boxes(
        rollout[:, 0], jnp.asarray(assigned), _j(gt_points), (Hp, Wp), (H, W),
        seed_thr=0.2, seed_multiple=0.5, cam_stride=1, ccl_iters=256,
    )
    np.testing.assert_allclose(np.asarray(cand), boxes_ref, rtol=1e-4, atol=1e-3)

    best_cams_patch = jnp.stack(
        [cams_patch[best_idx[g], g] for g in range(G)]
    )
    best_cams = resize(best_cams_patch, (H, W))
    np.testing.assert_allclose(
        np.asarray(best_cams), best_cams_ref.numpy(), rtol=1e-4, atol=1e-6
    )

    pl = masks_and_centers(
        jax.random.PRNGKey(0), best_cams, _j(feats), _j(best_boxes_ref),
        _j(gt_points), jnp.asarray(gt_labels), jnp.ones((G,), bool),
        pos_mask_thr=0.35, refine_times=2, obj_tau=0.9, mean_shift_times=10,
        num_semantic_points=5, map_stride=1, img_hw=(H, W),
        points_override=(_j(pts_fg.numpy()), _j(pts_bg.numpy())),
    )

    np.testing.assert_allclose(
        np.asarray(pl.map_fg), ref_fg[-1].numpy(), rtol=1e-4, atol=1e-5
    )
    # masks: allow boundary-pixel flips from float noise at the threshold
    mask_diff = np.abs(
        np.asarray(pl.pseudo_masks, np.float32) - ref_masks.astype(np.float32)
    ).mean()
    assert mask_diff < 1e-3, mask_diff

    for g in range(G):
        want = coords_org.numpy()[corres_gt.numpy() == g]
        got = np.asarray(pl.centers.coords[g])[np.asarray(pl.centers.part_valid[g])]
        assert got.shape == want.shape, f"instance {g}: {got.shape} vs {want.shape}"
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_update_fg_map_cascade_parity(ref):
    """RepPoints-cascade fg-map re-estimation vs `stdroi:2737-2760`.

    Drives the extracted ``update_fg_map`` wrapper (+
    ``update_fg_map_single_v3:2814-2845``, ``extract_bg_coords:28-50``,
    ``get_refined_similarity_input_map:710-747``) and our
    ``refine_fg_maps`` from identical inputs on a NON-SQUARE grid
    (Hp=6, Wp=9). The only randomness is the reference's bg-supplement
    ``randperm``; its draw is captured by calling ``extract_bg_coords``
    under the same torch seed and injected into our side via
    ``bg_points_override``.

    Deliberate divergence NOT exercised here: an instance with zero
    parts — the reference's `:2820` emptiness check tests ``.shape[0]``
    of a (1, 0, D) split (always 1), so its no-parts branch is
    unreachable and ``torch.mean`` of the empty block yields NaN; our
    ``nv > 0`` fallback to the Stage-B prototype is the sane completion.
    """
    r, _ = ref
    from attentionshift_tpu.models.reppoints import refine_fg_maps

    rng = np.random.RandomState(3)
    G, D, Hp, Wp = 3, 16, 6, 9
    H, W = Hp * 16, Wp * 16
    num_parts = [2, 1, 3]
    P = max(num_parts)

    feats = (rng.randn(D, Hp, Wp) * 0.4).astype(np.float32)
    # regional structure so prototypes separate
    feats[:, :3, :4] += rng.randn(D, 1, 1).astype(np.float32)
    feats[:, 3:, 5:] += rng.randn(D, 1, 1).astype(np.float32)

    boxes = np.asarray(
        [[10, 8, 70, 60], [60, 20, 130, 90], [20, 50, 120, 92]], np.float32
    )
    # fg maps: zero outside each box (a real background region exists)
    fg = np.zeros((G, H, W), np.float32)
    for g, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        fg[g, y1:y2, x1:x2] = rng.rand(y2 - y1, x2 - x1)

    centers_flat = np.asarray(
        [[30, 30], [50, 40], [90, 55], [40, 70], [70, 80], [100, 70]], np.float32
    )  # xy, concatenated per instance in order (2, 1, 3)
    centers = np.full((G, P, 2), -1.0, np.float32)
    cval = np.zeros((G, P), bool)
    off = 0
    for g, n in enumerate(num_parts):
        centers[g, :n] = centers_flat[off : off + n]
        cval[g, :n] = True
        off += n

    fp = (rng.randn(G + 1, D) * 0.5).astype(np.float32)
    bp = (rng.randn(G, D) * 0.5).astype(np.float32)

    # ---- reference side
    fg_t = _t(fg)
    bg_map_t = fg_t.sum(0) == 0
    torch.manual_seed(11)
    bg_coords = r.extract_bg_coords(bg_map_t, num_groups=1)  # (1, 5, 2)

    tokens = _t(feats.reshape(D, -1).T)  # (N, D) patch tokens
    vit_feat_t = torch.cat([torch.zeros(1, D), tokens])[None]  # (1, 1+N, D)
    shim = types.SimpleNamespace()
    shim.update_fg_map_single_v3 = types.MethodType(
        r.update_fg_map_single_v3, shim
    )
    torch.manual_seed(11)  # reproduce the extract_bg_coords draw inside
    ref_attn, ref_masks = r.update_fg_map(
        shim, [fg_t], None, vit_feat_t, [_t(centers_flat)], [num_parts],
        [_t(fp)[:, :, None, None]], [_t(bp)[:, :, None, None]], [_t(boxes)],
        0.35,
    )
    ref_attn = ref_attn[0].numpy()
    ref_masks = ref_masks[0].astype(np.uint8)

    # ---- ours
    new, masks = refine_fg_maps(
        _j(fg), _j(feats), _j(boxes), _j(centers), jnp.asarray(cval),
        _j(fp), _j(bp), jnp.ones((G,), bool),
        bg_points_override=_j(bg_coords[0].numpy()),
    )
    np.testing.assert_allclose(np.asarray(new), ref_attn, rtol=1e-4, atol=1e-5)
    mask_diff = np.abs(
        np.asarray(masks, np.float32) - ref_masks.astype(np.float32)
    ).mean()
    assert mask_diff < 1e-3, mask_diff

@pytest.mark.slow
def test_composed_seed_parity_realistic_scale(ref):
    """The composed Stage A->B->C chain at the REAL bench geometry:
    50x84 patch grid / 800x1344 frame, padded ``max_gt`` slots, 8
    independent fixtures (VERDICT round-3 item 4).

    The 12x12 / 10x17 composed test above catches semantic bugs; this
    one targets what only shows up at scale — padding interactions
    (invalid instance slots ride through the winner-take-all and CCL
    exactly as the detector feeds them), stride plumbing on non-tiny
    extents, and the full-resolution CCL fixpoint (scipy host labeler as
    the cc_torch stand-in vs our XLA while_loop at 800x1344). Rollout is
    excluded (its parity is pinned by test_rollout_point_rows_parity and
    the composed 10x17 fixture; a (T,T)@(T,T) torch rollout at T=4211
    costs minutes per fixture on this 1-core host): both sides consume
    the same row-normalised rollout-like point-token rows.

    Done-criteria from the VERDICT: per-fixture pseudo-box IoU ~ 1.0 and
    map_fg correlation > 0.99. Reference chain composed per
    `stdroi:2209-2415`.
    """
    r, _ = ref
    from attentionshift_tpu.ops.image import resize
    from attentionshift_tpu.pseudo.engine import candidate_boxes, masks_and_centers

    L, P, D = 3, 10, 16
    Hp, Wp = 50, 84
    H, W = Hp * 16, Wp * 16
    N = Hp * Wp
    T = 1 + N + P
    G_PAD = 8

    jit_cand = jax.jit(
        lambda rows, tok, pts, val: candidate_boxes(
            rows, tok, pts, (Hp, Wp), (H, W), seed_thr=0.2, seed_multiple=0.5,
            cam_stride=1, ccl_iters=256, valid=val,
        )
    )
    jit_engine = jax.jit(
        lambda key, cams, feats, boxes, pts, lbls, val, ov: masks_and_centers(
            key, cams, feats, boxes, pts, lbls, val,
            pos_mask_thr=0.35, refine_times=2, obj_tau=0.9,
            mean_shift_times=10, num_semantic_points=5, map_stride=1,
            img_hw=(H, W), points_override=ov,
        )
    )

    def iou(a, b):
        ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ix * iy
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-9)

    yy, xx = np.mgrid[0:Hp, 0:Wp]
    for fix in range(8):
        rng = np.random.RandomState(100 + fix)
        gv = int(rng.randint(3, 7))  # valid instances in 8 slots
        blob_rc = [
            (int(rng.randint(6, Hp - 6)), int(rng.randint(6, Wp - 6)))
            for _ in range(gv)
        ]
        sig = rng.uniform(2.0, 4.0, gv)

        # rollout-like rows: row-normalised, gaussian bump per assigned
        # token over the patch block
        assigned = rng.choice(P, gv, replace=False).astype(np.int64)
        rows = np.abs(rng.randn(L, P, T).astype(np.float32)) * 0.05
        for g, (br, bc) in enumerate(blob_rc):
            bump = 6.0 * np.exp(
                -((yy - br) ** 2 + (xx - bc) ** 2) / (2 * sig[g] ** 2)
            )
            rows[:, assigned[g], 1 : 1 + N] += bump.reshape(-1).astype(np.float32)
        rows = rows / rows.sum(-1, keepdims=True)

        gt_points_v = np.asarray(
            [[bc * 16 + 8.0, br * 16 + 8.0] for br, bc in blob_rc], np.float32)
        gt_labels_v = rng.randint(0, 20, gv).astype(np.int64)

        base = rng.randn(D, 1, 1).astype(np.float32)
        feats = (base + 0.3 * rng.randn(D, Hp, Wp)).astype(np.float32)
        for br, bc in blob_rc:
            feats[:, max(br - 3, 0) : br + 1, max(bc - 3, 0) : bc + 1] += (
                0.5 * rng.randn(D, 1, 1).astype(np.float32))
            feats[:, br : br + 4, bc : bc + 4] += (
                0.5 * rng.randn(D, 1, 1).astype(np.float32))

        # -------- reference chain (valid instances only, torch)
        rows_t = _t(rows)
        cams_ref = rows_t[:, torch.from_numpy(assigned), 1 : 1 + N].reshape(
            L * gv, 1, Hp, Wp)
        cams_up_ref = F.interpolate(
            cams_ref, (H, W), mode="bilinear").reshape(L, gv, H, W)
        boxes_ref = np.zeros((gv, L, 4), np.float32)
        for l in range(L):
            for g in range(gv):
                bb, _ = r.get_bbox_from_cam_fast(
                    cams_up_ref[l, g].clone(), _t(gt_points_v[g]), cam_thr=0.2,
                    area_ratio=0.5, img_size=(H, W), box_method="expand")
                boxes_ref[g, l] = bb[0].numpy()
        best_idx = rng.randint(0, L, gv)  # stand-in for the learned MIL pick
        best_boxes_ref = boxes_ref[np.arange(gv), best_idx]
        best_cams_ref = torch.stack(
            [cams_up_ref[best_idx[g], g] for g in range(gv)])

        torch.manual_seed(fix)
        ref_fg, ref_bg, pts_fg, pts_bg, *_ = r.get_cosine_similarity_refined_map(
            best_cams_ref.clone(), _t(feats), _t(best_boxes_ref),
            thr_pos=0.2, thr_neg=0.1, num_points=20, refine_times=2,
            obj_tau=0.9, gt_points=_t(gt_points_v[:, ::-1].copy()))
        ref_masks = (ref_fg[-1] > 0.35).numpy().astype(np.uint8)

        shim = types.SimpleNamespace()
        shim.mean_shift_grid_prototype = types.MethodType(
            r.mean_shift_grid_prototype, shim)
        outs = r.get_semantic_centers(
            shim, ref_fg[-1].clone(), ref_bg[-1].clone(), _t(best_boxes_ref),
            _t(feats), pos_thr=0.35, refine_times=10,
            gt_labels=torch.from_numpy(gt_labels_v),
            merge_thr=0.85, num_semantic_points=5)
        coords_org, corres_gt = outs[6], outs[8]

        # -------- our chain (padded to G_PAD slots, like the detector)
        pad = G_PAD - gv
        valid = np.asarray([True] * gv + [False] * pad)
        assigned_p = np.concatenate([assigned, np.zeros(pad, np.int64)])
        gt_points_p = np.concatenate(
            [gt_points_v, np.zeros((pad, 2), np.float32)])
        gt_labels_p = np.concatenate([gt_labels_v, np.zeros(pad, np.int64)])

        cand, cams_patch = jit_cand(
            _j(rows), jnp.asarray(assigned_p), _j(gt_points_p),
            jnp.asarray(valid))
        cand = np.asarray(cand)
        for g in range(gv):
            for l in range(L):
                assert iou(cand[g, l], boxes_ref[g, l]) > 0.995, (
                    fix, g, l, cand[g, l], boxes_ref[g, l])

        best_cams_patch = jnp.concatenate([
            jnp.stack([cams_patch[best_idx[g], g] for g in range(gv)]),
            cams_patch[0, gv:],
        ])
        best_cams = resize(best_cams_patch, (H, W))
        boxes_p = np.concatenate(
            [best_boxes_ref, np.tile([[0, 0, 1, 1]], (pad, 1))]
        ).astype(np.float32)
        # pad the shared seed-point draw: valid rows, zero rows for the
        # padding slots, then the reference's final mean-map support row
        fg_np, bg_np = pts_fg.numpy(), pts_bg.numpy()
        ov = (
            _j(np.concatenate(
                [fg_np[:gv], np.zeros((pad,) + fg_np.shape[1:], np.float32),
                 fg_np[gv:]])),
            _j(np.concatenate(
                [bg_np, np.zeros((pad,) + bg_np.shape[1:], np.float32)])),
        )
        pl = jit_engine(
            jax.random.PRNGKey(fix), best_cams, _j(feats), _j(boxes_p),
            _j(gt_points_p), jnp.asarray(gt_labels_p), jnp.asarray(valid), ov)

        got_fg = np.asarray(pl.map_fg[:gv])
        want_fg = ref_fg[-1].numpy()
        for g in range(gv):
            a, b = got_fg[g].ravel(), want_fg[g].ravel()
            corr = float(np.corrcoef(a, b)[0, 1]) if a.std() > 0 else 1.0
            assert corr > 0.99, (fix, g, corr)
        np.testing.assert_allclose(got_fg, want_fg, rtol=1e-3, atol=1e-4,
                                   err_msg=f"fixture {fix} map_fg")
        mask_diff = np.abs(
            np.asarray(pl.pseudo_masks[:gv], np.float32)
            - ref_masks.astype(np.float32)).mean()
        assert mask_diff < 1e-3, (fix, mask_diff)
        # padded slots must come out empty
        assert np.asarray(pl.pseudo_masks[gv:]).sum() == 0

        for g in range(gv):
            want = coords_org.numpy()[corres_gt.numpy() == g]
            got = np.asarray(pl.centers.coords[g])[
                np.asarray(pl.centers.part_valid[g])]
            assert got.shape == want.shape, (fix, g, got.shape, want.shape)
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3,
                                       err_msg=f"fixture {fix} inst {g}")
