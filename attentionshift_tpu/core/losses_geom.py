"""Geometric / contrastive losses: chamfer family, border loss, InfoNCE.

Fixed-shape rebuilds of `mmdet/models/losses/chamfer_loss.py:12-206`,
`mmdet/models/losses/pts_border_loss.py:9-46`, and
`mmdet/models/losses/info_nce_loss.py` — consumed by the RepPoints-style
part refinement head (SURVEY.md section 2.9). Ragged point sets become
padded arrays with validity masks; invalid points are excluded from both
min-reductions and means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "chamfer_distance",
    "chamfer_loss",
    "sim_masked_chamfer_loss",
    "pts_border_loss",
    "info_nce_loss",
]

_BIG = 1e9


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_valid: jnp.ndarray | None = None,
    y_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Symmetric chamfer distance (``ChamferDistancePytorch`` semantics:
    L2 point distances, mean over nearest-neighbour matches both ways,
    averaged).

    Args:
        x: (..., P1, 2); y: (..., P2, 2).
        x_valid / y_valid: optional (..., P1) / (..., P2) masks.
    """
    c = jnp.linalg.norm(x[..., :, None, :] - y[..., None, :, :], axis=-1)
    if y_valid is not None:
        c = jnp.where(y_valid[..., None, :], c, _BIG)
    if x_valid is not None:
        c = jnp.where(x_valid[..., :, None], c, _BIG)

    def masked_mean(vals, valid):
        if valid is None:
            return vals.mean(-1)
        vals = jnp.where(valid, vals, 0.0)
        return vals.sum(-1) / jnp.maximum(valid.sum(-1), 1)

    d1 = masked_mean(jnp.min(c, -1), x_valid)  # x -> nearest y
    d2 = masked_mean(jnp.min(c, -2), y_valid)  # y -> nearest x
    return (d1 + d2) / 2.0


def chamfer_loss(
    pts_pred: jnp.ndarray,
    pts_gt: jnp.ndarray,
    pred_valid: jnp.ndarray | None = None,
    gt_valid: jnp.ndarray | None = None,
    obj_valid: jnp.ndarray | None = None,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """``ChamferLoss2D``: per-object chamfer, averaged over objects.

    pts_pred: (N, P1, 2) (the reference flattens per-object point sets);
    pts_gt: (N, P2, 2); obj_valid masks padded objects (the reference's
    ``set_2.sum() >= 0`` empty-set guard).
    """
    d = chamfer_distance(pts_pred, pts_gt, pred_valid, gt_valid)  # (N,)
    if obj_valid is not None:
        d = jnp.where(obj_valid, d, 0.0)
        return loss_weight * d.sum() / jnp.maximum(obj_valid.sum(), 1)
    return loss_weight * d.mean()


def sim_masked_chamfer_loss(
    part_pts: jnp.ndarray,
    contour_pts: jnp.ndarray,
    part_feats: jnp.ndarray,
    contour_feats: jnp.ndarray,
    part_valid: jnp.ndarray,
    contour_valid: jnp.ndarray,
    obj_valid: jnp.ndarray,
    sim_thr: float = 0.85,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """``SimFocusChamferLoss2D``: per part, chamfer only against contour
    points whose features are cosine-similar (>= sim_thr) to the part.

    Args:
        part_pts: (N, K, Pp, 2) refined points per part.
        contour_pts: (N, Pc, 2) target contour points.
        part_feats: (N, K, D); contour_feats: (N, Pc, D).
        part_valid: (N, K); contour_valid: (N, Pc); obj_valid: (N,).
    """
    fp = part_feats / jnp.maximum(
        jnp.linalg.norm(part_feats, axis=-1, keepdims=True), 1e-6
    )
    fc = contour_feats / jnp.maximum(
        jnp.linalg.norm(contour_feats, axis=-1, keepdims=True), 1e-6
    )
    sim = jnp.einsum("nkd,npd->nkp", fp, fc)  # (N, K, Pc)
    sim_ok = (sim >= sim_thr) & contour_valid[:, None, :]
    has_any = sim_ok.any(-1)  # (N, K): parts with no similar contour -> 0 loss
    d = chamfer_distance(
        part_pts,
        jnp.broadcast_to(contour_pts[:, None], sim.shape[:2] + contour_pts.shape[1:]),
        x_valid=jnp.broadcast_to(part_valid[..., None], part_pts.shape[:-1]),
        y_valid=sim_ok,
    )  # (N, K)
    d = jnp.where(part_valid & has_any, d, 0.0)
    per_obj = d.sum(-1) / jnp.maximum(part_valid.sum(-1), 1)
    per_obj = jnp.where(obj_valid, per_obj, 0.0)
    return loss_weight * per_obj.sum() / jnp.maximum(obj_valid.sum(), 1)


def pts_border_loss(
    pts: jnp.ndarray,
    gt_bboxes: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    loss_weight: float = 1.0,
    y_first: bool = False,
) -> jnp.ndarray:
    """``PtsBorderLoss``: hinge penalty for points outside their gt box.

    pts: (N, P*2) or (N, P, 2); gt_bboxes: (N, 4); valid: (N,) objects.
    """
    p = pts.reshape(pts.shape[0], -1, 2)
    px = p[:, :, 1] if y_first else p[:, :, 0]
    py = p[:, :, 0] if y_first else p[:, :, 1]
    left = jnp.maximum(gt_bboxes[:, None, 0] - px, 0)
    right = jnp.maximum(px - gt_bboxes[:, None, 2], 0)
    up = jnp.maximum(gt_bboxes[:, None, 1] - py, 0)
    bottom = jnp.maximum(py - gt_bboxes[:, None, 3], 0)
    loss = jnp.stack([left, right, up, bottom], axis=1)  # (N, 4, P)
    # reference: mean over points per side, then mean over all (N, 4)
    per_obj = loss.mean(-1).sum(-1)  # (N,) sum of per-side means
    if valid is not None:
        per_obj = jnp.where(valid, per_obj, 0.0)
        return loss_weight * per_obj.sum() / jnp.maximum(valid.sum() * 4.0, 1.0)
    return loss_weight * per_obj.mean() / 4.0


def info_nce_loss(
    query: jnp.ndarray,
    positive_key: jnp.ndarray,
    negative_keys: jnp.ndarray | None = None,
    temperature: float = 0.1,
    paired: bool = False,
) -> jnp.ndarray:
    """InfoNCE (`info_nce_loss.py`): L2-normalised dot-product logits /
    temperature, cross-entropy against the positive.

    query/positive_key: (N, D). negative_keys: (M, D) unpaired or
    (N, M, D) paired; None -> other positives act as negatives.
    """
    norm = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    q, pk = norm(query), norm(positive_key)
    if negative_keys is None:
        logits = q @ pk.T / temperature  # (N, N), diagonal = positives
        labels = jnp.arange(q.shape[0])
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
    nk = norm(negative_keys)
    pos = (q * pk).sum(-1, keepdims=True)  # (N, 1)
    if paired:
        neg = jnp.einsum("nd,nmd->nm", q, nk)
    else:
        neg = q @ nk.T  # (N, M)
    logits = jnp.concatenate([pos, neg], axis=-1) / temperature
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -logp[:, 0].mean()
