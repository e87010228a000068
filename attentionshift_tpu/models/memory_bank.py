"""Cross-image object memory bank + align loss.

Fixed-shape functional rebuild of ``ObjectQueues`` / ``ObjectElements`` /
``ObjectFactory`` (`mmdet/models/utils/memory_bank.py:28-216`) and the
align loss that consumes it (`stdroi_point_deform_attn_reppoints.py:
3250-3286`, optional capability — orphaned in the shipped reference).

The reference keeps per-class python lists of ragged part features; here
the bank is ONE pytree of arrays (classes x queue x parts x dim) with
validity masks, so it can live in a jitted train step and be donated
across steps. Retrieval gating reproduces the reference rules: token
cosine > ``appear_thresh`` and box aspect ratio within ``ratio_range``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["MemoryBank", "init_bank", "bank_append", "retrieve_similar", "align_loss"]


class MemoryBank(NamedTuple):
    tokens: jnp.ndarray  # (C, Q, D)
    part_feats: jnp.ndarray  # (C, Q, P, D)
    part_valid: jnp.ndarray  # (C, Q, P)
    boxes: jnp.ndarray  # (C, Q, 4)
    slot_valid: jnp.ndarray  # (C, Q)
    ptr: jnp.ndarray  # (C,) int32 circular write pointer


def init_bank(num_classes: int, queue_len: int, max_parts: int, dim: int) -> MemoryBank:
    return MemoryBank(
        tokens=jnp.zeros((num_classes, queue_len, dim), jnp.float32),
        part_feats=jnp.zeros((num_classes, queue_len, max_parts, dim), jnp.float32),
        part_valid=jnp.zeros((num_classes, queue_len, max_parts), bool),
        boxes=jnp.zeros((num_classes, queue_len, 4), jnp.float32),
        slot_valid=jnp.zeros((num_classes, queue_len), bool),
        ptr=jnp.zeros((num_classes,), jnp.int32),
    )


def bank_append(
    bank: MemoryBank,
    class_idx: jnp.ndarray,
    token: jnp.ndarray,
    part_feats: jnp.ndarray,
    part_valid: jnp.ndarray,
    box: jnp.ndarray,
    enable: jnp.ndarray | bool = True,
) -> MemoryBank:
    """Circular-append ONE object into its class queue (``append``)."""
    c = class_idx.astype(jnp.int32)
    q = bank.ptr[c]
    en = jnp.asarray(enable)

    def put(arr, val):
        cur = arr[c, q]
        return arr.at[c, q].set(jnp.where(en, val, cur))

    new = MemoryBank(
        tokens=put(bank.tokens, token),
        part_feats=put(bank.part_feats, part_feats),
        part_valid=put(bank.part_valid, part_valid),
        boxes=put(bank.boxes, box),
        slot_valid=put(bank.slot_valid, jnp.asarray(True)),
        ptr=bank.ptr.at[c].set(
            jnp.where(en, (q + 1) % bank.tokens.shape[1], q)
        ),
    )
    return new


def _cos(a, b, eps=1e-5):
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), eps)
    return (a / na) @ (b / nb).swapaxes(-1, -2)


def retrieve_similar(
    bank: MemoryBank,
    class_idx: jnp.ndarray,
    token: jnp.ndarray,
    box: jnp.ndarray,
    appear_thresh: float = 0.7,
    ratio_range: tuple[float, float] = (0.5, 2.0),
) -> jnp.ndarray:
    """(Q,) bool retrieval mask over the class queue (``get_similar_obj``):
    token cosine > thresh AND aspect-ratio ratio within range."""
    c = class_idx.astype(jnp.int32)
    toks = bank.tokens[c]  # (Q, D)
    token_sim = jnp.clip(_cos(token[None], toks)[0], 0.0)  # (Q,)
    qr = (box[2] - box[0]) / jnp.maximum(box[3] - box[1], 1e-5)
    kb = bank.boxes[c]
    kr = (kb[:, 2] - kb[:, 0]) / jnp.maximum(kb[:, 3] - kb[:, 1], 1e-5)
    ratio = qr / jnp.maximum(kr, 1e-5)
    return (
        (token_sim > appear_thresh)
        & (ratio >= ratio_range[0])
        & (ratio <= ratio_range[1])
        & bank.slot_valid[c]
    )


def align_loss(
    bank: MemoryBank,
    class_idx: jnp.ndarray,
    token: jnp.ndarray,
    part_feats: jnp.ndarray,
    part_valid: jnp.ndarray,
    box: jnp.ndarray,
    appear_thresh: float = 0.7,
    ratio_range: tuple[float, float] = (0.5, 2.0),
) -> jnp.ndarray:
    """Cross-image align loss for one object: min cosine DISTANCE between
    each of its part features and the parts of retrieved same-class
    peers, averaged over valid parts (``align_forward_train`` semantics).
    Returns 0 when nothing is retrievable."""
    c = class_idx.astype(jnp.int32)
    keep = retrieve_similar(bank, class_idx, token, box, appear_thresh, ratio_range)
    peer_feats = bank.part_feats[c]  # (Q, P, D)
    peer_valid = bank.part_valid[c] & keep[:, None]  # (Q, P)
    sim = _cos(part_feats, peer_feats.reshape(-1, peer_feats.shape[-1]))  # (Pq, Q*P)
    dist = 1.0 - sim
    dist = jnp.where(peer_valid.reshape(-1)[None, :], dist, jnp.inf)
    min_d = jnp.min(dist, axis=-1)  # (Pq,)
    usable = part_valid & jnp.isfinite(min_d)
    min_d = jnp.where(usable, min_d, 0.0)
    return min_d.sum() / jnp.maximum(usable.sum(), 1)
