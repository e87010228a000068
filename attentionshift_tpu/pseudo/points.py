"""Fixed-shape random/strided point selection from eligibility masks.

The reference samples supervision points with data-dependent shapes
(``nonzero`` + ``randperm``/``randint``,
`stdroi_point_deform_attn_reppoints.py:343-371,433-461,1786-1806`). On
TPU we re-express every selection as a fixed-size draw from a boolean
eligibility mask:

- ``sample_in_mask``: uniform-with-replacement draw (matches the
  reference's ``randint % num_pix`` in ``sample_point_grid``),
- ``strided_in_mask``: deterministic strided pick in raster order
  (matches ``mean_shift_grid_prototype``'s ``arange(0, n, n//k)`` grid),
- ``topk_in_mask``: Gumbel top-k = uniform *without* replacement
  (matches ``randperm[:k]`` in the fg/bg mask-point sampler).

All return (k, 2) integer (row, col) coords plus a scalar count of
eligible pixels so callers can apply the reference's fallback rules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_in_mask", "strided_in_mask", "topk_in_mask"]


def _coords_of_flat(flat_idx: jnp.ndarray, width: int) -> jnp.ndarray:
    return jnp.stack([flat_idx // width, flat_idx % width], axis=-1)


def _raster_cumsum(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive raster-order count of True pixels, flattened (H*W,).

    Integer-exact equal to ``cumsum(mask.reshape(-1))`` but decomposed as
    a per-row scan plus a scan over row totals: a flat (H*W,) cumsum
    forces XLA through log2(H*W) full-width passes in an awkward
    relayout (round-4 trace: five s32 copies+scan fusions ~0.7 ms/step
    at the bench shape); the 2-D form is log2(W) passes plus an (H,)
    scan.
    """
    m = mask.astype(jnp.int32)
    rows = jnp.cumsum(m, axis=-1)  # (H, W) within-row inclusive
    row_tot = rows[:, -1]
    prior = jnp.cumsum(row_tot) - row_tot  # exclusive prefix of rows
    return (rows + prior[:, None]).reshape(-1)


def sample_in_mask(rng: jax.Array, mask: jnp.ndarray, k: int):
    """Draw k eligible pixels uniformly with replacement.

    Returns (coords (k, 2) int32 row/col, n_eligible scalar). With zero
    eligible pixels, coords are all zeros — callers must branch on
    ``n_eligible``.
    """
    h, w = mask.shape
    cnt = _raster_cumsum(mask)
    n = cnt[-1]
    r = jax.random.randint(rng, (k,), 0, jnp.maximum(n, 1))
    idx = jnp.searchsorted(cnt, r + 1)
    idx = jnp.clip(idx, 0, h * w - 1)
    return _coords_of_flat(idx, w).astype(jnp.int32), n


def strided_in_mask(mask: jnp.ndarray, k: int):
    """Pick k eligible pixels at even raster-order strides.

    Mirrors ``grid = arange(0, n, n // k)[:k]``; if fewer than k eligible,
    the eligible pixels fill the leading slots and the rest repeat from
    the start (the reference's ``fill_in_idx`` repetition).
    """
    h, w = mask.shape
    cnt = _raster_cumsum(mask)
    n = cnt[-1]
    step = jnp.maximum(n // k, 1)
    ranks = jnp.arange(k, dtype=jnp.int32) * step  # 0-based ranks
    ranks = jnp.where(n > 0, ranks % jnp.maximum(n, 1), 0)
    idx = jnp.searchsorted(cnt, ranks + 1)
    idx = jnp.clip(idx, 0, h * w - 1)
    return _coords_of_flat(idx, w).astype(jnp.int32), n


def topk_in_mask(rng: jax.Array, mask: jnp.ndarray, k: int):
    """Draw up to k eligible pixels uniformly WITHOUT replacement.

    Gumbel-top-k over the mask, using ``approx_max_k`` (TPU-optimised
    partial sort; exact fallback elsewhere) — exactness is irrelevant
    for uniform sampling. Slots beyond the eligible count repeat earlier
    draws cyclically (``fill_in_idx`` semantics). Returns
    (coords (k, 2), per-slot validity (k,), n_eligible).
    """
    h, w = mask.shape
    flat = mask.reshape(-1)
    n = flat.sum().astype(jnp.int32)
    g = jax.random.gumbel(rng, flat.shape)
    scores = jnp.where(flat, g, -jnp.inf)
    _, idx = jax.lax.approx_max_k(scores, k)
    idx = idx.astype(jnp.int32)
    slot = jnp.arange(k)
    valid = slot < n
    # cyclic refill of invalid slots from the valid prefix
    refill = jnp.where(n > 0, slot % jnp.maximum(n, 1), 0)
    idx = jnp.where(valid, idx, idx[refill])
    idx = jnp.clip(idx, 0, h * w - 1)
    return _coords_of_flat(idx, w).astype(jnp.int32), valid, n
