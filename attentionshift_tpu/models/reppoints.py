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
    centers: jnp.ndarray,
    center_valid: jnp.ndarray,
    pos_mask_thr: float = 0.35,
):
    """``update_fg_map`` analog (`stdroi:2737-2760`): re-estimate per-
    instance fg maps as the max cosine similarity to the refined part
    centers' features; instances whose new map is empty keep the old one.

    fg_maps: (G, H, W); vit_feat: (D, Hp, Wp); centers: (G, P, 2) xy.
    Returns (new fg maps (G, H, W), pseudo masks (G, H, W) uint8).
    """
    d, hp, wp = vit_feat.shape
    g, p, _ = centers.shape
    h, w = fg_maps.shape[-2:]
    col = jnp.clip((centers[..., 0] / 16).astype(jnp.int32), 0, wp - 1)
    row = jnp.clip((centers[..., 1] / 16).astype(jnp.int32), 0, hp - 1)
    feats = vit_feat[:, row, col]  # (D, G, P)
    f = vit_feat.reshape(d, -1)
    fn = f / jnp.maximum(jnp.linalg.norm(f, axis=0, keepdims=True), 1e-8)
    cn = feats / jnp.maximum(jnp.linalg.norm(feats, axis=0, keepdims=True), 1e-8)
    sim = jnp.einsum("dgp,dn->gpn", cn, fn).reshape(g, p, hp, wp)
    sim = jnp.where(center_valid[..., None, None], sim, -1.0)
    attn = jnp.maximum(sim.max(axis=1), 0.0)  # (G, Hp, Wp)
    attn = resize(attn, (h, w))
    empty = attn.sum(axis=(-2, -1)) <= 0
    new = jnp.where(empty[:, None, None], fg_maps, attn)
    mx = new.max(axis=(-2, -1), keepdims=True)
    masks = (new > mx * pos_mask_thr).astype(jnp.uint8)
    return new, masks
