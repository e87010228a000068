"""Iterative cosine-similarity refinement of fg/bg maps (Stage B).

Rebuilds the reference chain `get_cosine_similarity_refined_map:1000-1019`
-> `get_refined_similarity:668-707` -> `get_point_cos_similarity_map:335-341`
plus the mask supervision point sampler
(`get_mask_points_single_box_cos_map_fg_bg:433-461`, box-crop wrapper
`get_mask_sample_points_roi_best_attn_feat_refine:1966-1993`) as pure
fixed-shape functions over a padded instance axis.

Conventions: ``G`` padded instance count with a ``valid`` mask;
``vit_feat`` is (D, Hp, Wp) patch-resolution features; "full-res" maps are
(H, W) = (16*Hp, 16*Wp). Only the final refinement step's maps are
materialised (the reference stacks all steps but consumes only ``[-1]``
on the runnable path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.image import resize
from ..ops.masks import box2mask, corrosion
from .cam import norm_attns
from .points import sample_in_mask, strided_in_mask, topk_in_mask

__all__ = [
    "point_prototype_sim",
    "refined_similarity",
    "refined_similarity_from_map",
    "cosine_similarity_refined_map",
    "sample_fgbg_points",
    "sample_mask_points",
    "decouple_instance",
    "normalize_map",
]


def normalize_map(m: jnp.ndarray) -> jnp.ndarray:
    """Divide each (..., H, W) map by its max (`normalize_map:1037-1040`)."""
    mx = m.max(axis=(-2, -1), keepdims=True)
    return m / (mx + 1e-8)


def decouple_instance(map_bg: jnp.ndarray, map_fg: jnp.ndarray) -> jnp.ndarray:
    """Per-instance background decoupling (`decouple_instance:1042-1046`)."""
    bg = normalize_map(map_bg)
    fg = normalize_map(map_fg)
    fake_bg = 1.0 - (fg * 0.5 + bg * 0.5)
    return bg + fake_bg


def point_prototype_sim(points_xy: jnp.ndarray, vit_feat: jnp.ndarray) -> jnp.ndarray:
    """Mean-of-point-features prototype -> cosine map.

    Args:
        points_xy: (M, K, 2) xy in full-res pixel coords.
        vit_feat: (D, Hp, Wp).

    Returns:
        (M, Hp, Wp) cosine similarity to each instance prototype.
    """
    d, hp, wp = vit_feat.shape
    col = jnp.clip(points_xy[..., 0].astype(jnp.int32) // 16, 0, wp - 1)
    row = jnp.clip(points_xy[..., 1].astype(jnp.int32) // 16, 0, hp - 1)
    feats = vit_feat[:, row, col]  # (D, M, K)
    proto = feats.mean(axis=-1).T  # (M, D)
    return _cos_map(vit_feat, proto)


def _cos_map(vit_feat: jnp.ndarray, proto: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between (D, Hp, Wp) features and (M, D) prototypes."""
    d, hp, wp = vit_feat.shape
    f = vit_feat.reshape(d, -1)
    fn = f / jnp.maximum(jnp.linalg.norm(f, axis=0, keepdims=True), 1e-8)
    pn = proto / jnp.maximum(jnp.linalg.norm(proto, axis=1, keepdims=True), 1e-8)
    sim = jnp.einsum("md,dn->mn", pn, fn, preferred_element_type=jnp.float32)
    return sim.reshape(-1, hp, wp)


def refined_similarity(
    points_xy: jnp.ndarray,
    vit_feat: jnp.ndarray,
    boxes: jnp.ndarray,
    num_box_maps: int,
    refine_times: int = 2,
    tau: float = 0.85,
    is_select: bool = False,
    valid: jnp.ndarray | None = None,
):
    """Iterative prototype refinement (`get_refined_similarity:668-707`).

    Args:
        points_xy: (M, K, 2) seed points (full-res xy).
        vit_feat: (D, Hp, Wp).
        boxes: (G, 4) pseudo boxes (full-res coords); the first
            ``num_box_maps`` maps are box-masked when ``is_select``.
        num_box_maps: G (maps beyond this index are bg-support rows).
        valid: (M,) instance validity for the winner-take-all argmax.

    Returns:
        final_map: (M, Hp, Wp) final refined (and selected) map,
        proto: (M, D) final prototypes.
    """
    d, hp, wp = vit_feat.shape
    cos = point_prototype_sim(points_xy, vit_feat)  # (M, Hp, Wp)
    m = cos.shape[0]
    bbox_mask = box2mask(jnp.floor(boxes / 16.0), (hp, wp), default_val=0.0)
    f = vit_feat.reshape(d, -1)
    proto = None

    def select(cmap):
        body = jnp.concatenate(
            [cmap[:num_box_maps] * bbox_mask, cmap[num_box_maps:]], axis=0
        )
        cand = body
        if valid is not None:
            cand = jnp.where(valid[:, None, None], body, -1.0)
        winner = jnp.argmax(cand, axis=0)
        keep = winner[None] == jnp.arange(m)[:, None, None]
        return body, jnp.where(keep, body, 0.0)

    for _ in range(refine_times):
        thr = cos.max(axis=(-2, -1), keepdims=True) * tau
        cosm = jnp.where(cos < thr, 0.0, cos)
        wsum = jnp.maximum(cosm.reshape(m, -1).sum(-1, keepdims=True), 1e-8)
        proto = jnp.einsum(
            "mn,dn->md", cosm.reshape(m, -1), f, preferred_element_type=jnp.float32
        ) / wsum
        cos = _cos_map(vit_feat, proto)
        if is_select:
            cos, selected = select(cos)
        else:
            selected = cos
    if proto is None:  # refine_times == 0
        proto = jnp.zeros((m, d), jnp.float32)
        selected = select(cos)[1] if is_select else cos
    return selected, proto


def refined_similarity_from_map(
    cos_map: jnp.ndarray,
    vit_feat: jnp.ndarray,
    boxes: jnp.ndarray,
    num_box_maps: int,
    refine_times: int = 3,
    tau: float = 0.85,
    is_select: bool = True,
    valid: jnp.ndarray | None = None,
):
    """Prototype refinement seeded from a given cosine map.

    `get_refined_similarity_input_map:710-747` analog: the same
    threshold -> masked-mean prototype -> cosine loop as
    ``refined_similarity`` but starting from ``cos_map`` instead of seed
    points. Faithful ordering detail: the FIRST iteration thresholds the
    raw input map; box-masking (first ``num_box_maps`` rows) is applied
    to the loop variable only after each re-estimate, so later
    iterations threshold box-masked maps (`:735-741` mutates the loop
    clone in place).

    Args:
        cos_map: (M, Hp, Wp) initial cosine maps.
        valid: (M,) row validity for the winner-take-all argmax
            (padding-instance rows never win).

    Returns:
        final (M, Hp, Wp) winner-take-all-selected map of the last
        iteration, final prototypes (M, D).
    """
    d, hp, wp = vit_feat.shape
    m = cos_map.shape[0]
    bbox_mask = box2mask(jnp.floor(boxes / 16.0), (hp, wp), default_val=0.0)
    f = vit_feat.reshape(d, -1)

    cos = cos_map
    selected = cos_map
    proto = jnp.zeros((m, d), jnp.float32)
    for _ in range(refine_times):
        thr = cos.max(axis=(-2, -1), keepdims=True) * tau
        cosm = jnp.where(cos < thr, 0.0, cos)
        wsum = jnp.maximum(cosm.reshape(m, -1).sum(-1, keepdims=True), 1e-8)
        proto = jnp.einsum(
            "mn,dn->md", cosm.reshape(m, -1).astype(jnp.float32),
            f.astype(jnp.float32), preferred_element_type=jnp.float32,
        ) / wsum
        cos = _cos_map(vit_feat, proto)
        if is_select:
            body = jnp.concatenate(
                [cos[:num_box_maps] * bbox_mask, cos[num_box_maps:]], axis=0
            )
            cand = body
            if valid is not None:
                cand = jnp.where(valid[:, None, None], body, -jnp.inf)
            winner = jnp.argmax(cand, axis=0)
            keep = winner[None] == jnp.arange(m)[:, None, None]
            selected = jnp.where(keep, body, 0.0)
            cos = body
        else:
            selected = cos
    return selected, proto


def sample_fgbg_points(
    rng: jax.Array,
    attn_norm: jnp.ndarray,
    gt_points: jnp.ndarray,
    thr_pos: float = 0.2,
    thr_neg: float = 0.1,
    num_points: int = 20,
    stride: int = 1,
):
    """Seed-point sampling (`sample_point_grid:343-371` semantics).

    Args:
        attn_norm: (G, H/stride, W/stride) min-max-normalised best-layer
            CAMs; ``stride=1`` is the reference's full-res sampling.
        gt_points: (G, 2) annotated xy in FULL-RES pixels (fallback fill
            for sparse fg).

    Returns:
        points_fg (G+1, num_points, 2) xy in full-res pixels (last row =
        mean-map bg support), points_bg (G, num_points, 2) xy.
    """
    g = attn_norm.shape[0]
    keys = jax.random.split(rng, 2 * g + 1)
    off = stride // 2  # map cell -> full-res pixel (0 when stride == 1)

    def fg_one(key, amap, gt_xy):
        mask = amap >= thr_pos
        coords_rand, n = sample_in_mask(key, mask, num_points)
        coords_raster, _ = strided_in_mask(mask, num_points)  # raster-order fill
        gt_rc = jnp.stack([gt_xy[1], gt_xy[0]])
        slot = jnp.arange(num_points)
        few = jnp.where(
            (slot < n)[:, None],
            coords_raster,
            ((gt_rc - off) / stride)[None, :].astype(jnp.int32),
        )
        coords = jnp.where(n >= num_points, coords_rand, few)
        coords = coords * stride + off
        return coords[..., ::-1].astype(jnp.float32)  # (row,col)->(x,y)

    def bg_one(key, amap):
        # threshold doubling until enough eligible (`:360-364`)
        ks = jax.random.split(key, 4)
        coords = jnp.zeros((num_points, 2), jnp.int32)
        got = jnp.bool_(False)
        for lvl in range(4):
            mask = amap < thr_neg * (2.0**lvl)
            c, n = sample_in_mask(ks[lvl], mask, num_points)
            take = jnp.logical_and(~got, n >= num_points)
            coords = jnp.where(take, c, coords)
            got = jnp.logical_or(got, n >= num_points)
        coords = coords * stride + off
        return coords[..., ::-1].astype(jnp.float32)

    points_fg = jax.vmap(fg_one)(keys[:g], attn_norm, gt_points)
    points_bg = jax.vmap(bg_one)(keys[g : 2 * g], attn_norm)
    supp = bg_one(keys[2 * g], attn_norm.mean(0))[None]
    points_fg = jnp.concatenate([points_fg, supp], axis=0)
    return points_fg, points_bg


class RefinedMaps(NamedTuple):
    map_fg: jnp.ndarray  # (G, H, W) final fg map, max-normalised
    map_bg: jnp.ndarray  # (G, H, W) decoupled bg map, max-normalised
    fg_proto: jnp.ndarray  # (G+1, D) final fg prototypes
    bg_proto: jnp.ndarray  # (G, D) final bg prototypes
    points_fg: jnp.ndarray
    points_bg: jnp.ndarray
    # FINAL patch-res similarity fields (G, Hp, Wp), pre-resize. The
    # whole refinement runs at patch resolution; the (H, W) grid only
    # hosts the pointwise product/normalise chain — so any consumer can
    # rebuild the EXACT stride-1 full-res maps from these regardless of
    # the stride this call ran at (see engine.masks_and_centers).
    fg_patch: jnp.ndarray
    bg_patch: jnp.ndarray


def cosine_similarity_refined_map(
    rng: jax.Array,
    cams: jnp.ndarray,
    vit_feat: jnp.ndarray,
    boxes: jnp.ndarray,
    gt_points: jnp.ndarray,
    valid: jnp.ndarray,
    thr_pos: float = 0.2,
    thr_neg: float = 0.1,
    num_points: int = 20,
    refine_times: int = 2,
    obj_tau: float = 0.85,
    points_override: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    stride: int = 1,
) -> RefinedMaps:
    """Full Stage-B map construction (`get_cosine_similarity_refined_map`).

    ``cams`` are (G, H/stride, W/stride) best-layer attention maps;
    ``stride=1`` (full res) reproduces the reference exactly. At
    ``stride>1`` every (H, W)-sized pass — seed sampling, map products,
    normalisation — runs on the decimated grid (the maps are bilinear
    upsamples of patch-res data, so information loss is nil for
    stride <= 16); all coordinates stay in full-res pixels.
    ``points_override``: optional (points_fg (G+1, K, 2), points_bg
    (G, K, 2)) replacing the random seed sampling — used by parity tests
    to drive both implementations from identical seeds.
    """
    g, h, w = cams.shape
    attn_norm = norm_attns(cams)
    if points_override is not None:
        points_fg, points_bg = points_override
    else:
        points_fg, points_bg = sample_fgbg_points(
            rng, attn_norm, gt_points, thr_pos, thr_neg, num_points,
            stride=stride,
        )
    valid_fg = jnp.concatenate([valid, jnp.ones((1,), valid.dtype)])
    cos_fg, fg_proto = refined_similarity(
        points_fg, vit_feat, boxes, g, refine_times, obj_tau, is_select=True,
        valid=valid_fg,
    )
    cos_bg, bg_proto = refined_similarity(
        points_bg, vit_feat, boxes, g, refine_times, obj_tau, is_select=False
    )
    fg_patch, bg_patch = cos_fg[:g], cos_bg
    cos_fg = resize(cos_fg, (h, w))[:g]
    cos_bg = resize(cos_bg, (h, w))
    ret = (1.0 - cos_bg) * cos_fg
    val = jnp.maximum(ret.max(axis=(-2, -1), keepdims=True), 1e-8)
    bg_dec = decouple_instance(cos_bg, ret)
    bg_val = jnp.maximum(bg_dec.max(axis=(-2, -1), keepdims=True), 1e-8)
    return RefinedMaps(
        map_fg=ret / val,
        map_bg=bg_dec / bg_val,
        fg_proto=fg_proto,
        bg_proto=bg_proto,
        points_fg=points_fg,
        points_bg=points_bg,
        fg_patch=fg_patch,
        bg_patch=bg_patch,
    )


def sample_mask_points(
    rng: jax.Array,
    map_fg: jnp.ndarray,
    map_bg: jnp.ndarray,
    boxes: jnp.ndarray,
    num_gt: int = 10,
    pos_thr: float = 0.6,
    neg_thr: float = 0.6,
    corr_size: int = 21,
    stride: int = 1,
):
    """Sample mask supervision points inside each pseudo-box.

    Per instance (`get_mask_points_single_box_cos_map_fg_bg:433-461`,
    crop semantics from `:1980-1988`): positives are the 21px-eroded
    super-threshold fg region (threshold = in-box max * pos_thr),
    negatives the super-threshold bg region; ``num_gt`` points are drawn
    uniformly without replacement from their union. Empty unions yield
    coords = -1 / labels = 0 (ignored downstream).

    ``stride``: resolution of ``map_fg``/``map_bg`` relative to the
    image; boxes and returned coords are always full-res pixels, and the
    erosion window shrinks to cover the same pixel extent.

    Returns (coords (G, num_gt, 2) xy, labels (G, num_gt) bool).
    """
    g, h, w = map_fg.shape
    keys = jax.random.split(rng, g)
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    if stride > 1:
        corr_size = max(1, (int(round(corr_size / stride)) // 2) * 2 + 1)

    def one(key, mfg, mbg, box):
        box = box / stride
        x1, y1, x2, y2 = (box.astype(jnp.int32)[i] for i in range(4))
        inside = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
        crop_max_fg = jnp.max(jnp.where(inside, mfg, -jnp.inf))
        crop_max_bg = jnp.max(jnp.where(inside, mbg, -jnp.inf))
        pos_bin = (mfg > crop_max_fg * pos_thr) & inside
        # crop-local erosion: outside-crop counts as foreground (ignored pad)
        pos_ero = corrosion(jnp.where(inside, pos_bin.astype(jnp.float32), 1.0), corr_size)
        pos_elig = (pos_ero > 0.0) & inside
        neg_elig = (mbg > crop_max_bg * neg_thr) & inside
        union = pos_elig | neg_elig
        coords, slot_valid, n = topk_in_mask(key, union, num_gt)
        labels = pos_elig[coords[:, 0], coords[:, 1]]
        xy = (coords[:, ::-1] * stride + stride // 2).astype(jnp.float32)
        empty = n == 0
        xy = jnp.where(empty, -jnp.ones_like(xy), xy)
        labels = jnp.where(empty, jnp.zeros_like(labels), labels)
        return xy, labels

    return jax.vmap(one)(keys, map_fg, map_bg, boxes)
