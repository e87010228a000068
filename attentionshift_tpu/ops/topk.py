"""Exact top-k SET selection without a sort.

``jax.lax.top_k`` on TPU lowers to a partial-sort custom call whose cost
grows with both n and k — at the RPN's pre-NMS selection
(n = 201,600 stride-4 anchor scores, k = 2000,
`mmdet RPNHead._get_bboxes_single` semantics) it measured 2.9 ms/step in
the round-5 train-step trace. This module selects the same SET with a
32-step binary search over the value's bit pattern (monotone
float32-to-uint32 map) plus one compaction pass: every step is a
vectorized compare+count over n, so the cost is ~33 cheap bandwidth
passes instead of a sort.

Contract vs ``lax.top_k``: the returned index SET is identical (ties at
the k-th value resolved by lowest index, exactly like ``lax.top_k``),
but the returned order is ascending-by-index rather than
descending-by-value. Use it where the consumer is order-insensitive
(gather + NMS-by-score, sampling masks); keep ``lax.top_k`` where rank
order matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["top_k_set"]


def _to_sortable_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone map from float32 to uint32 (NaN-free inputs).

    Standard radix trick: flip the sign bit for positives, flip ALL
    bits for negatives, so unsigned comparison matches float ordering.
    """
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = bits >> 31 == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_set(scores: jnp.ndarray, k: int):
    """Exact top-k of a 1-D score vector, order-insensitive.

    Args:
        scores: (N,) float scores (must be NaN-free; -inf allowed).
        k: static selection size, k <= N.

    Returns:
        (values, indices): both (k,), the top-k elements in ascending
        index order. Same SET as ``jax.lax.top_k(scores, k)``.
    """
    n = scores.shape[0]
    if k >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        return scores, idx
    u = _to_sortable_u32(scores)

    # binary search the largest threshold t with count(u >= t) >= k
    def body(_, lohi):
        lo, hi = lohi  # invariant: count(>= lo) >= k > count(>= hi+1)
        mid = lo + (hi - lo) // 2 + 1  # upper mid so the loop advances
        c = jnp.sum((u >= mid).astype(jnp.int32))
        return jnp.where(c >= k, mid, lo), jnp.where(c >= k, hi, mid - 1)

    lo0 = jnp.uint32(0)
    hi0 = jnp.uint32(0xFFFFFFFF)
    t, _ = jax.lax.fori_loop(0, 32, body, (lo0, hi0))

    above = u > t
    n_above = jnp.sum(above.astype(jnp.int32))
    at = u == t
    # fill the remaining k - n_above slots with the lowest-index ties,
    # matching lax.top_k's stable tie rule
    tie_rank = jnp.cumsum(at.astype(jnp.int32)) - 1
    sel = above | (at & (tie_rank < (k - n_above)))

    # compact the selected indices into a fixed (k,) list (ascending)
    pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
    idx = jnp.zeros((k,), jnp.int32).at[jnp.where(sel, pos, k)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return scores[idx], idx
