"""RepPoints-style dense part refinement head (the COCO-path cascade).

The reference config names a ``RepPointsDensePartAttnHead`` that was
never shipped (`configs/mae/attnshift_..._qc.py:61-84`, SURVEY.md
section 2.9); this module AUTHORS that head to its documented call
contract and loss recipe:

- stride-16 single-level dense head, 3 stacked 3x3 convs with GN
  (`:63-66`), a sigmoid objectness branch (CrossEntropyLoss
  use_sigmoid, weight 1) and a dense per-location offset field
  (RepPoints transform_method='minmax');
- per semantic-center anchor, offsets are point-sampled from the dense
  field (the shipped support code's sampling scheme,
  `deform_pseudo_point_generator.py:26-46`) giving ``num_points``
  candidate points per part;
- losses: PtsBorderLoss(0.5) on the minmax init box, ChamferLoss2D(1.0)
  of part points vs the object's semantic centers,
  ChamferGlobalEdgeLoss2D(1.0) of part points vs mask contour points,
  sigmoid CE(1.0) on the objectness map;
- returns refined semantic centers (per-part mean of its candidate
  points, kept when inside the gt box — the ``sample_cfg(mode='inside',
  dist_sample_thr=1)`` gate), enabling the
  ``num_reppoints_head``-cascade with fg-map re-estimation
  (`stdroi_point_deform_attn_reppoints.py:2663-2717,2737-2760`).

All shapes fixed: G objects x P parts with validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.losses import binary_cross_entropy
from ..core.losses_geom import chamfer_loss, pts_border_loss
from ..ops.image import resize
from ..ops.masks import corrosion
from ..ops.sampling import point_sample

__all__ = ["RepPointsPartHead", "contour_points", "refine_fg_maps"]


class RepPointsOut(NamedTuple):
    losses: dict
    new_centers: jnp.ndarray  # (B, G, P, 2)
    new_valid: jnp.ndarray  # (B, G, P)


def contour_points(masks: jnp.ndarray, num_points: int, rng: jax.Array):
    """Sample fixed-size contour point sets from binary masks.

    masks: (G, H, W) uint8/bool. Returns (coords (G, Pc, 2) xy float,
    valid (G, Pc)). Contour = mask minus its 3x3 erosion.
    """
    from ..pseudo.points import topk_in_mask

    g = masks.shape[0]
    m = masks.astype(jnp.float32)
    edge = (m - corrosion(m, 3) > 0.5) & (m > 0.5)
    keys = jax.random.split(rng, g)

    def one(key, e):
        coords, valid, n = topk_in_mask(key, e, num_points)
        return coords[:, ::-1].astype(jnp.float32), valid & (n > 0)

    return jax.vmap(one)(keys, edge)


class RepPointsPartHead(nn.Module):
    num_points: int = 9  # candidate points per part
    feat_channels: int = 256
    stacked_convs: int = 3
    stride: int = 16
    border_weight: float = 0.5
    chamfer_sem_weight: float = 1.0
    chamfer_contour_weight: float = 1.0
    cls_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        centers: jnp.ndarray,
        center_valid: jnp.ndarray,
        gt_valid: jnp.ndarray,
        gt_masks: jnp.ndarray,
        fg_maps: jnp.ndarray,
        contour_xy: jnp.ndarray,
        contour_valid: jnp.ndarray,
    ) -> RepPointsOut:
        """Args:
            feats: (B, Hf, Wf, C) stride-16 features (detached upstream).
            gt_boxes: (B, G, 4); centers: (B, G, P, 2) xy;
            center_valid: (B, G, P); gt_valid: (B, G);
            gt_masks: (B, G, H, W) pseudo masks (supervision only);
            fg_maps: (B, G, H, W) fg probability maps;
            contour_xy/contour_valid: (B, G, Pc, 2)/(B, G, Pc).
        """
        b, hf, wf, cin = feats.shape
        g, p = centers.shape[1:3]
        k = self.num_points
        x = feats
        for i in range(self.stacked_convs):
            x = nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"gn_{i}")(x)
            x = nn.relu(x)
        cls_logits = nn.Conv(1, (1, 1), dtype=self.dtype, name="cls_out")(x)[..., 0]
        pts_field = nn.Conv(2 * k, (1, 1), dtype=self.dtype, name="pts_out")(x)

        img_h, img_w = hf * self.stride, wf * self.stride

        # ---- sample per-anchor offsets (get_pred_by_sample semantics)
        anchors = centers.reshape(b, g * p, 2)
        anchors_norm = anchors / jnp.asarray([img_w, img_h], jnp.float32)
        field = pts_field.transpose(0, 3, 1, 2)  # (B, 2K, Hf, Wf)
        sampled = point_sample(field, anchors_norm)  # (B, 2K, G*P)
        offsets = sampled.transpose(0, 2, 1).reshape(b, g, p, k, 2) * self.stride
        pred_pts = centers[:, :, :, None, :] + offsets  # (B, G, P, K, 2)

        pv = center_valid & gt_valid[:, :, None]  # (B, G, P)

        # ---- losses
        # (1) border loss on the minmax init box of each object's points
        obj_pts = pred_pts.reshape(b * g, p * k, 2)
        obj_pv = jnp.broadcast_to(pv[..., None], pred_pts.shape[:-1]).reshape(
            b * g, p * k
        )
        # masked minmax: invalid points collapse to the box centre
        ctr = ((gt_boxes[..., :2] + gt_boxes[..., 2:]) / 2).reshape(b * g, 1, 2)
        safe_pts = jnp.where(obj_pv[..., None], obj_pts, ctr)
        loss_border = pts_border_loss(
            safe_pts.reshape(b * g, -1), gt_boxes.reshape(b * g, 4),
            valid=gt_valid.reshape(-1), loss_weight=self.border_weight,
        )

        # (2) chamfer: object's predicted points vs its semantic centers
        loss_sem = chamfer_loss(
            safe_pts, centers.reshape(b * g, p, 2),
            pred_valid=obj_pv,
            gt_valid=pv.reshape(b * g, p),
            obj_valid=gt_valid.reshape(-1) & pv.reshape(b * g, p).any(-1),
            loss_weight=self.chamfer_sem_weight,
        )

        # (3) chamfer: predicted points vs mask contour
        cont_ok = gt_valid.reshape(-1) & contour_valid.reshape(b * g, -1).any(-1)
        safe_cont = jnp.where(
            contour_valid.reshape(b * g, -1)[..., None],
            contour_xy.reshape(b * g, -1, 2), ctr,
        )
        loss_contour = chamfer_loss(
            safe_pts, safe_cont,
            pred_valid=obj_pv,
            gt_valid=contour_valid.reshape(b * g, -1),
            obj_valid=cont_ok,
            loss_weight=self.chamfer_contour_weight,
        )

        # (4) objectness: fg occupancy at feature resolution
        occ = resize(fg_maps.max(axis=1), (hf, wf))  # (B, Hf, Wf)
        tgt = (occ > 0.5).astype(jnp.float32)
        loss_cls = self.cls_weight * binary_cross_entropy(
            cls_logits.reshape(-1), tgt.reshape(-1)
        )

        # ---- refined centers: mean of candidate points inside the gt box
        x1y1 = gt_boxes[:, :, None, None, :2]
        x2y2 = gt_boxes[:, :, None, None, 2:]
        inside = ((pred_pts >= x1y1) & (pred_pts <= x2y2)).all(-1)  # (B,G,P,K)
        wsum = jnp.maximum(inside.sum(-1, keepdims=True), 1)
        new_centers = (pred_pts * inside[..., None]).sum(-2) / wsum
        any_inside = inside.any(-1)
        new_centers = jnp.where(any_inside[..., None], new_centers, centers)
        new_valid = pv & any_inside

        losses = {
            "loss_rp_border": loss_border,
            "loss_rp_chamfer_sem": loss_sem,
            "loss_rp_chamfer_contour": loss_contour,
            "loss_rp_cls": loss_cls,
        }
        return RepPointsOut(losses, jax.lax.stop_gradient(new_centers), new_valid)


def refine_fg_maps(
    fg_maps: jnp.ndarray,
    vit_feat: jnp.ndarray,
    boxes: jnp.ndarray,
    centers: jnp.ndarray,
    center_valid: jnp.ndarray,
    fg_proto: jnp.ndarray,
    bg_proto: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array | None = None,
    pos_mask_thr: float = 0.35,
    bg_points_override: jnp.ndarray | None = None,
):
    """``update_fg_map`` rebuild (`stdroi:2737-2760` wrapper +
    ``update_fg_map_single_v3`` `:2814-2845`): re-estimate per-instance
    fg maps between RepPoints cascade stages.

    Per instance, a prototype mixes the Stage-B fg prototype with the
    refined part centers' (bilinear point-sampled) features — the
    reference's `:2821` ``torch.mean`` over the whole (n_parts, D) block
    is a SCALAR (all-dims mean), mixed 0.5/0.5, replicated here. Rows
    G and G+1 are the Stage-B bg-support prototype and a background
    supplement averaged from up-to-5 points sampled without replacement
    from the all-instance background region (``extract_bg_coords:28-50``
    — which normalises (row, col) by (H, W) and feeds the result to
    ``point_sample`` as (x, y), i.e. TRANSPOSED sampling; replicated for
    parity, and harmless: the rows only supply generic non-object
    features to the winner-take-all). The prototype cosine maps then run
    3 box-masked winner-take-all refinement iterations
    (`get_refined_similarity_input_map:710-747`), are upsampled,
    bg-suppressed by the Stage-B bg prototypes' cosine maps and
    max-normalised; instances whose new map sums to exactly 0 keep the
    old one (`:2755-2756`).

    Args:
        fg_maps: (G, H, W) current full-res fg maps.
        vit_feat: (D, Hp, Wp) patch features.
        boxes: (G, 4) pseudo boxes (full-res xyxy) for the box masks.
        centers: (G, P, 2) refined part centers, xy full-res.
        center_valid: (G, P) part validity.
        fg_proto: (G+1, D) Stage-B fg prototypes (last = bg support).
        bg_proto: (G, D) Stage-B bg prototypes.
        valid: (G,) instance validity (padding rows never win the
            argmax and always keep their old map).
        rng: bg-supplement sampling key (required unless
            ``bg_points_override`` is given).
        bg_points_override: (K, 2) normalised sample coords replacing
            the random draw — parity tests drive both implementations
            from identical samples.

    Returns (new fg maps (G, H, W), pseudo masks (G, H, W) uint8).
    """
    from ..pseudo.points import topk_in_mask
    from ..pseudo.refine import _cos_map, refined_similarity_from_map

    d, hp, wp = vit_feat.shape
    g, p, _ = centers.shape
    h, w = fg_maps.shape[-2:]

    # (1) part-center features: mmcv point_sample (bilinear) at
    # centers / (W, H), matching `:2815-2816`
    norm_xy = centers.reshape(-1, 2) / jnp.asarray([w, h], jnp.float32)
    sc_feat = point_sample(vit_feat[None].astype(jnp.float32), norm_xy[None])[0]
    sc_feat = sc_feat.reshape(d, g, p)
    nv = center_valid.sum(-1)  # (G,)
    scal = (sc_feat * center_valid[None]).sum(axis=(0, 2)) / jnp.maximum(nv * d, 1)
    mixed = jnp.where(
        (nv > 0)[:, None], 0.5 * scal[:, None] + 0.5 * fg_proto[:g], fg_proto[:g]
    )

    # (2) background supplement (`:2828-2832`)
    if bg_points_override is not None:
        bg_xy = bg_points_override
    else:
        bg_map = fg_maps.sum(0) == 0
        coords, slot_valid, n = topk_in_mask(rng, bg_map, 5)
        coords = jnp.where(n > 0, coords, jnp.ones_like(coords))
        bg_xy = (coords.astype(jnp.float32) + 0.5) / jnp.asarray(
            [h, w], jnp.float32
        )  # (row, col)/(H, W) consumed as (x, y) — the reference quirk
    bg_supp = point_sample(vit_feat[None].astype(jnp.float32), bg_xy[None])[0]
    bg_supp = bg_supp.mean(-1)  # (D,)

    protos = jnp.concatenate(
        [mixed, fg_proto[g : g + 1], bg_supp[None]], axis=0
    )  # (G+2, D)
    sim = _cos_map(vit_feat, protos)
    valid_rows = jnp.concatenate([valid, jnp.ones((2,), bool)])
    sel, _ = refined_similarity_from_map(
        sim, vit_feat, boxes, g, refine_times=3, tau=0.85, is_select=True,
        valid=valid_rows,
    )
    attn = resize(sel[:g], (h, w))
    bg_attn = resize(_cos_map(vit_feat, bg_proto), (h, w))  # (G, H, W)
    attn = (1.0 - bg_attn) * attn
    attn = attn / jnp.maximum(attn.max(axis=(-2, -1), keepdims=True), 1e-8)
    empty = (attn.sum(axis=(-2, -1)) == 0) | ~valid
    new = jnp.where(empty[:, None, None], fg_maps, attn)
    mx = new.max(axis=(-2, -1), keepdims=True)
    masks = (new > mx * pos_mask_thr).astype(jnp.uint8)
    return new, masks
