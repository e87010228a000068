"""Attention rollout, restructured to stream point-token rows.

The reference materialises the full cumulative rollout for every layer
(`attns_project_to_feature`,
`stdroi_point_deform_attn_reppoints.py:1257-1272`): residual-augmented,
row-normalised attention matrices multiplied top-down, keeping all L full
(T, T) products. Downstream only ever reads the *point-token rows over
patch keys* (`seed_pseudo_gt:2272`), so we compute

    R_0 = rows(Aug[L-1]);   R_i = R_{i-1} @ Aug[L-1-i]

keeping only (P, T) row blocks — an O(T^2 P) matmul chain instead of
O(T^3), and O(L P T) memory instead of O(L T^2). Output order matches the
reference's ``reverse_joint``: index 0 = last layer alone, index L-1 =
full product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["attention_rollout_point_rows", "augment_attention"]


def augment_attention(attn: jnp.ndarray) -> jnp.ndarray:
    """(..., T, T) attention -> residual-augmented row-normalised matrix."""
    t = attn.shape[-1]
    eye = jnp.eye(t, dtype=attn.dtype)
    aug = attn + eye
    return aug / aug.sum(-1, keepdims=True)


def attention_rollout_point_rows(
    attns: jnp.ndarray, num_points: int
) -> jnp.ndarray:
    """Rollout restricted to the trailing ``num_points`` query rows.

    Args:
        attns: (L, B, T, T) mean-head attention of the trailing L blocks,
            in depth order (attns[-1] = deepest block).
        num_points: number of point tokens P (the last P rows).

    Returns:
        (L, B, P, T) float32; out[i] equals the point-token rows of the
        reference's ``reverse_joint_attentions[i]``.
    """
    l, b, t, _ = attns.shape
    aug = augment_attention(attns.astype(jnp.float32))
    r0 = aug[-1][:, -num_points:, :]  # (B, P, T)

    def step(r, a_rev):
        r_new = jnp.einsum(
            "bpt,btu->bpu", r, a_rev, preferred_element_type=jnp.float32
        )
        return r_new, r_new

    # multiply by aug[-2], aug[-3], ..., aug[0]
    rest = aug[:-1][::-1]  # (L-1, B, T, T)
    _, rs = jax.lax.scan(step, r0, rest)
    return jnp.concatenate([r0[None], rs], axis=0)
