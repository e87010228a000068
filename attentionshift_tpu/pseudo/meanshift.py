"""Cosine mean-shift part discovery (Stage C — "attention shift" proper).

Rebuilds the reference's part-prototype pipeline as fixed-shape jax:

- ``cosine_shift_batch`` (`stdroi_point_deform_attn_reppoints.py:830-854`)
  + ``update_density_batch`` (:882-908): the mean-shift fixed point over
  prototype/feature cosine similarity with per-prototype bandwidth,
- ``mean_shift_grid_prototype`` (:1778-1840): strided seed selection on
  the eroded fg map and the shift loop over box-masked features,
- ``filter_maps`` (:265-275): fg-occupancy prototype filter,
- ``merge_maps`` (:278-294): greedy triu cosine merging (order-dependent
  semantics preserved, rewritten as a masked fori_loop),
- ``get_center_coord_with_feat`` (:222-262): per-part argmax-mean centre
  coordinates + features, capped at ``num_max_obj + 1`` parts/instance.

Padded instances/prototypes carry validity masks instead of ragged lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.image import resize
from ..ops.masks import box2mask, corrosion
from .points import strided_in_mask

__all__ = [
    "cosine_shift_batch",
    "mean_shift_grid_prototype",
    "filter_maps",
    "merge_maps",
    "get_center_coords",
    "semantic_centers",
    "SemanticCenters",
]


def _cos(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Cosine similarity contracting the last axis (torch eps semantics)."""
    num = jnp.einsum("...d,...d->...", a, b, preferred_element_type=jnp.float32)
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return num / (na * nb)


def cosine_shift_batch(
    prototypes: jnp.ndarray,
    feats: jnp.ndarray,
    feats_org: jnp.ndarray,
    tau: float = 0.1,
    temp: float = 0.1,
    n_shift: int = 10,
    matmul_dtype=None,
):
    """Batched cosine mean-shift (`cosine_shift_batch:830-854`).

    Args:
        prototypes: (G, K, D) initial part prototypes.
        feats: (G, N, D) box-masked per-instance features.
        feats_org: (N, D) unmasked features for the final similarity.
        matmul_dtype: operand dtype for the three per-iteration dots (the
            loop's dominant cost; bench profile round 4). Norms, the
            softmax chain, and accumulation stay f32, so bf16 here only
            rounds the dot OPERANDS — the same precision the reference's
            apex-O1 fp16 matmuls ran at. None = operand dtype (the exact
            f32 chain the parity tests pin).

    Returns:
        prototypes (G, K, D), sim (G, K, N) final cosine maps.
    """
    g, k, d = prototypes.shape
    mm = matmul_dtype or jnp.float32
    # feats is loop-constant: its norm (the cosine denominator's nb) is
    # hoisted out of the fixed point — the reference recomputes it every
    # F.cosine_similarity call, but it is bit-identical hoisted because
    # the division structure num / (na * nb) is preserved below.
    nb = jnp.maximum(
        jnp.linalg.norm(feats.astype(jnp.float32), axis=-1), 1e-8
    )  # (G, N)
    fm = feats.astype(mm)

    def cos_feats(prot):
        num = jnp.einsum(
            "gkd,gnd->gkn", prot.astype(mm), fm,
            preferred_element_type=jnp.float32,
        )
        na = jnp.maximum(jnp.linalg.norm(prot, axis=-1), 1e-8)  # (G, K)
        return num / (na[..., None] * nb[:, None, :])

    def step(carry, _):
        prot, tau_arr = carry
        sim = cos_feats(prot)  # (G, K, N)
        scaled = sim / (temp * tau_arr)
        # hard assignment in LOG space: the reference argmaxes the softmax
        # weights directly, which survives in torch because far features
        # land on f32 subnormals — XLA flushes those to zero and the
        # argmax would degrade to index 0. log w = scaled - logsumexp is
        # the same ordering computed exactly; the softmax weights reuse
        # the same logsumexp (exp(logw) == softmax) instead of a second
        # max/exp/sum chain over the (G, K, N) block.
        logw = scaled - jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
        weight = jnp.exp(logw)
        feat_idx = jnp.argmax(logw, axis=1, keepdims=True)  # (G, 1, N)
        mask_w = (jnp.arange(k)[None, :, None] == feat_idx).astype(jnp.float32)
        prot = jnp.einsum(
            "gkn,gnd->gkd", (weight * mask_w).astype(mm), fm,
            preferred_element_type=jnp.float32,
        )
        # update_density_batch: 1 - mean assigned similarity
        sim2 = cos_feats(prot)
        cnt = mask_w.sum(-1)
        dens = (sim2 * mask_w).sum(-1)
        dens = 1.0 - jnp.where(cnt >= 1, dens / jnp.maximum(cnt, 1.0), 0.0)
        tau_arr = jnp.maximum(dens, 1e-10)[..., None]
        return (prot, tau_arr), None

    tau0 = jnp.full((g, k, 1), tau, jnp.float32)
    (prot, _), _ = jax.lax.scan(step, (prototypes.astype(jnp.float32), tau0), None, length=n_shift)
    sim = _cos(prot[:, :, None, :], feats_org[None, None, :, :])
    return prot, sim


def mean_shift_grid_prototype(
    maps: jnp.ndarray,
    vit_feat: jnp.ndarray,
    rois: jnp.ndarray,
    thr: float = 0.35,
    n_shift: int = 10,
    tau: float = 0.1,
    temp: float = 0.1,
    n_points: int = 20,
    matmul_dtype=None,
    use_pallas: bool = False,
):
    """Seed + run the mean shift (`mean_shift_grid_prototype:1778-1840`).

    Args:
        maps: (G, Hp, Wp) binary fg occupancy at patch resolution.
        vit_feat: (D, Hp, Wp).
        rois: (G, 4) full-res pseudo boxes.

    Returns:
        prototypes (G, n_points, D), sim (G, n_points, Hp, Wp) clamped >= 0.
    """
    d, hp, wp = vit_feat.shape
    g = maps.shape[0]

    def seeds_one(m, roi):
        coords, n = strided_in_mask(m >= thr, n_points)  # (K, 2) row/col
        # n == 0 fallback: box centre at patch grid
        ctr = jnp.stack(
            [(roi[1] + roi[3]) // 32.0, (roi[0] + roi[2]) // 32.0]
        ).astype(jnp.int32)
        ctr = jnp.clip(ctr, 0, jnp.asarray([hp - 1, wp - 1]))
        return jnp.where(n > 0, coords, ctr[None, :])

    coords = jax.vmap(seeds_one)(maps, rois)  # (G, K, 2)
    prototypes = vit_feat[:, coords[..., 0], coords[..., 1]].transpose(1, 2, 0)  # (G,K,D)

    box_mask = box2mask(jnp.floor(rois / 16.0), (hp, wp), default_val=0.0)  # (G,Hp,Wp)
    f = vit_feat.reshape(d, -1).T  # (N, D)
    if use_pallas:
        # one VMEM-resident kernel for the whole fixpoint (the (G, K, N)
        # intermediates never touch HBM) — ops/meanshift_kernel.py
        from ..ops.meanshift_kernel import cosine_shift_fixpoint

        prot, sim = cosine_shift_fixpoint(
            prototypes, box_mask.reshape(g, -1), f, tau=tau, temp=temp,
            n_shift=n_shift, matmul_dtype=matmul_dtype,
        )
    else:
        feats = f[None, :, :] * box_mask.reshape(g, -1, 1)
        prot, sim = cosine_shift_batch(prototypes, feats, f, tau=tau, temp=temp,
                                       n_shift=n_shift, matmul_dtype=matmul_dtype)
    return prot, jnp.maximum(sim.reshape(g, n_points, hp, wp), 0.0)


def filter_maps(
    sim: jnp.ndarray, pos_maps: jnp.ndarray, pos_thr: float = 0.85
) -> jnp.ndarray:
    """Prototype fg-occupancy filter (`filter_maps:265-275`).

    Args:
        sim: (G, K, Hp, Wp) prototype similarity maps.
        pos_maps: (G, Hp, Wp) fg occupancy weights.

    Returns:
        (G, K) bool validity.
    """
    fore = (sim > 0.8).astype(jnp.float32)
    score = (pos_maps[:, None] * fore).sum(axis=(-2, -1)) / jnp.maximum(
        fore.sum(axis=(-2, -1)), 1e-6
    )
    return score >= pos_thr


def merge_maps(prot: jnp.ndarray, valid: jnp.ndarray, thr: float = 0.85):
    """Greedy triu cosine merge per instance (`merge_maps:278-294`).

    Preserves the reference's order-dependent semantics: rows are
    processed in index order; a row forms a group from its >=thr upper-
    triangular partners, then all absorbed rows are disabled.

    Args:
        prot: (G, K, D) prototypes; valid: (G, K) bool.

    Returns:
        merged (G, K, D), merged_valid (G, K).
    """

    def one(p, v):
        k = p.shape[0]
        sim = _cos(p[:, None, :], p[None, :, :])
        triu = jnp.triu(jnp.ones((k, k), jnp.bool_))
        mat = (sim >= thr) & triu & v[:, None] & v[None, :]

        def body(i, state):
            mat, out, out_v = state
            weight = mat[i].astype(jnp.float32)
            s = weight.sum()
            merged = jnp.einsum("k,kd->d", weight, p) / (s + 1e-8)
            has = s > 0
            out = out.at[i].set(jnp.where(has, merged, out[i]))
            out_v = out_v.at[i].set(has)
            mat = jnp.where(has & (weight > 0.0)[:, None], False, mat)
            return mat, out, out_v

        out = jnp.zeros_like(p)
        out_v = jnp.zeros((k,), jnp.bool_)
        _, out, out_v = jax.lax.fori_loop(0, k, body, (mat, out, out_v))
        return out, out_v

    return jax.vmap(one)(prot, valid)


def get_center_coords(
    sim: jnp.ndarray,
    prot_valid: jnp.ndarray,
    rois: jnp.ndarray,
    labels: jnp.ndarray,
    vit_feat: jnp.ndarray,
    max_parts: int,
):
    """Part centre extraction (`get_center_coord_with_feat:222-262`).

    Args:
        sim: (G, K, Hp, Wp) merged-prototype cosine maps (unclamped).
        prot_valid: (G, K) merged validity.
        rois: (G, 4) boxes; labels: (G,) class ids.
        vit_feat: (D, Hp, Wp).
        max_parts: slots per instance (= num_semantic_points + 1,
            reproducing the reference's inclusive ``i_prot > num_max_obj``
            break).

    Returns:
        coords (G, max_parts, 2) xy full-res, part_valid (G, max_parts),
        feats (G, max_parts, D).
    """
    g, k, hp, wp = sim.shape
    rows = jnp.arange(hp, dtype=jnp.float32)[:, None]
    cols = jnp.arange(wp, dtype=jnp.float32)[None, :]

    def one(smaps, v, roi, feat_hw):
        # order prototypes by area of (map > 0.9), invalid last
        area = (smaps > 0.9).sum(axis=(-2, -1))
        area = jnp.where(v, area, -1)
        order = jnp.argsort(-area)  # descending
        take = order[:max_parts]
        tv = v[take]

        smap_t = smaps[take]  # (P, Hp, Wp)
        mx = smap_t.max(axis=(-2, -1), keepdims=True)
        amax = smap_t >= mx  # ties included (`map_ >= top2`)
        cnt = jnp.maximum(amax.sum(axis=(-2, -1)), 1)
        mean_r = (amax * rows).sum(axis=(-2, -1)) / cnt
        mean_c = (amax * cols).sum(axis=(-2, -1)) / cnt
        x = (mean_c + 0.5) * 16.0
        y = (mean_r + 0.5) * 16.0
        inside = (x >= roi[0]) & (x <= roi[2]) & (y >= roi[1]) & (y <= roi[3])
        pv = tv & inside
        fr = jnp.clip(mean_r.astype(jnp.int32), 0, hp - 1)
        fc = jnp.clip(mean_c.astype(jnp.int32), 0, wp - 1)
        feats = feat_hw[:, fr, fc].T  # (P, D)
        return jnp.stack([x, y], axis=-1), pv, feats

    coords, part_valid, feats = jax.vmap(one, in_axes=(0, 0, 0, None))(
        sim, prot_valid, rois, vit_feat
    )
    return coords, part_valid, feats


class SemanticCenters(NamedTuple):
    coords: jnp.ndarray  # (G, P, 2) xy
    part_valid: jnp.ndarray  # (G, P)
    feats: jnp.ndarray  # (G, P, D)
    labels: jnp.ndarray  # (G,) class id per instance


def semantic_centers(
    map_fg: jnp.ndarray,
    map_bg: jnp.ndarray,
    rois: jnp.ndarray,
    vit_feat: jnp.ndarray,
    gt_labels: jnp.ndarray,
    valid: jnp.ndarray,
    pos_thr: float = 0.35,
    n_shift: int = 10,
    merge_thr: float = 0.85,
    num_semantic_points: int = 3,
    num_prototypes: int = 20,
    stride: int = 1,
    matmul_dtype=None,
    use_pallas: bool = False,
) -> SemanticCenters:
    """Stage C driver (`get_semantic_centers:1995-2031`).

    ``map_fg``/``map_bg`` are the Stage-B maps at image resolution /
    ``stride`` (the reference's full res at ``stride=1``); everything
    else runs at patch resolution, so only the binarise+erode+downsample
    prologue sees the stride.
    """
    d, hp, wp = vit_feat.shape
    g, h, w = map_fg.shape
    corr = 11 if stride == 1 else max(1, (int(round(11 / stride)) // 2) * 2 + 1)
    fg_bin = jnp.where(map_fg > pos_thr, 1.0, 0.0)
    fg_corr = corrosion(fg_bin, corr_size=corr)
    fg_inter = resize(fg_corr, (hp, wp))
    bg_inter = resize(map_bg.max(axis=0, keepdims=True), (hp, wp))
    del bg_inter  # kept for signature parity; filter uses fg occupancy only
    map_fg_patch = jnp.where(fg_inter > pos_thr, 1.0, 0.0)

    prot, sim = mean_shift_grid_prototype(
        map_fg_patch, vit_feat, rois, thr=pos_thr, n_shift=n_shift,
        n_points=num_prototypes, matmul_dtype=matmul_dtype,
        use_pallas=use_pallas,
    )
    keep = filter_maps(sim, fg_inter)  # (G, K)
    keep = keep & valid[:, None]
    merged, merged_valid = merge_maps(prot, keep, thr=merge_thr)

    # similarity of merged prototypes over the full feature map
    f = vit_feat.reshape(d, -1)
    fn = f / jnp.maximum(jnp.linalg.norm(f, axis=0, keepdims=True), 1e-8)
    mn = merged / jnp.maximum(jnp.linalg.norm(merged, axis=-1, keepdims=True), 1e-8)
    mm = matmul_dtype or jnp.float32
    sim_merged = jnp.einsum(
        "gkd,dn->gkn", mn.astype(mm), fn.astype(mm),
        preferred_element_type=jnp.float32,
    ).reshape(g, -1, hp, wp)

    coords, part_valid, feats = get_center_coords(
        sim_merged, merged_valid, rois, gt_labels, vit_feat,
        max_parts=num_semantic_points + 1,
    )
    part_valid = part_valid & valid[:, None]
    return SemanticCenters(coords, part_valid, feats, gt_labels)
