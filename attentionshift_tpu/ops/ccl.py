"""Connected-components labeling on accelerator.

TPU-native replacement for the reference's CUDA BUF union-find kernel
(``cc_torch.connected_components_labeling``, used on the pseudo-label hot
path at `stdroi_point_deform_attn_reppoints.py:23,68`). Instead of a
union-find (data-dependent memory traffic), we run iterative min-label
propagation with pointer jumping:

1. every foreground pixel starts with its own flat index as label,
2. each step takes the min label over the 3x3 (8-conn) or cross (4-conn)
   neighbourhood of foreground pixels,
3. pointer jumping ``L <- L[L]`` (path compression) after each sweep makes
   convergence effectively logarithmic for blob-like regions,
4. a ``lax.while_loop`` runs to fixpoint with a safety iteration cap.

Output semantics match cc_torch: background = 0, each component gets a
distinct positive id (here: min flat index in the component + 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["connected_components"]


def _neighbor_min(labels: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    if connectivity == 8:
        return jax.lax.reduce_window(
            labels,
            jnp.asarray(jnp.iinfo(jnp.int32).max, labels.dtype),
            jax.lax.min,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
        )
    elif connectivity == 4:
        big = jnp.asarray(jnp.iinfo(jnp.int32).max, labels.dtype)
        horiz = jax.lax.reduce_window(
            labels, big, jax.lax.min, (1, 3), (1, 1), ((0, 0), (1, 1))
        )
        vert = jax.lax.reduce_window(
            labels, big, jax.lax.min, (3, 1), (1, 1), ((1, 1), (0, 0))
        )
        return jnp.minimum(horiz, vert)
    raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def connected_components(
    mask: jnp.ndarray, connectivity: int = 8, max_iters: int = 256
) -> jnp.ndarray:
    """Label connected components of a binary (H, W) mask.

    Args:
        mask: (H, W) bool / {0,1} array; nonzero = foreground.
        connectivity: 8 (default, matches cc_torch) or 4.
        max_iters: safety cap on propagation sweeps. Each sweep includes
            two pointer-jumping passes, so even worst-case serpentine
            shapes of length ``O(H*W)`` converge in far fewer sweeps.

    Returns:
        (H, W) int32 labels; 0 = background, components numbered by
        ``min flat index + 1``.
    """
    h, w = mask.shape
    fg = mask.astype(jnp.bool_)
    big = jnp.iinfo(jnp.int32).max
    init = jnp.where(
        fg, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w), big
    )

    def sweep(labels):
        nmin = _neighbor_min(labels, connectivity)
        labels = jnp.where(fg, jnp.minimum(labels, nmin), big)
        # pointer jumping: follow the stored flat index twice
        flat = labels.reshape(-1)
        safe = jnp.where(flat == big, 0, flat)
        for _ in range(2):
            hop = jnp.where(flat == big, big, flat[safe])
            flat = jnp.minimum(flat, hop)
            safe = jnp.where(flat == big, 0, flat)
        return flat.reshape(h, w)

    def cond(state):
        labels, prev_changed, it = state
        return jnp.logical_and(prev_changed, it < max_iters)

    def body(state):
        labels, _, it = state
        new = sweep(labels)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True), 0))
    return jnp.where(fg, labels + 1, 0).astype(jnp.int32)
