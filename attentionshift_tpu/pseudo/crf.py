"""Mean-field CRF refinement of attention maps.

Capability rebuild of ``AttnCRFer`` + ``MeanFieldDecoder``
(`mmdet_plugins/utils/crf.py:305,478-711` — exported but unused on the
reference's runnable path, SURVEY.md section 2.8): per-instance attention
maps are treated as unaries of a dense CRF whose pairwise potential
combines feature cosine similarity with a spatial Gaussian; a fixed
number of mean-field iterations sharpens the maps. The reference
iterates python objects over geodesic "water-fill" structures; this is
the fixed-shape vectorised mean-field core (one (N, N) affinity matmul
per iteration — MXU-friendly at patch resolution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["feature_affinity", "mean_field_refine"]


def feature_affinity(
    feats: jnp.ndarray, hw: tuple[int, int], sigma_factor: float = 0.5,
    sim_bin_thr: float = 0.0,
) -> jnp.ndarray:
    """(N, D) patch features -> (N, N) pairwise affinity.

    Cosine feature similarity modulated by a spatial Gaussian of width
    ``sigma_factor * sqrt(H*W)`` (MeanFieldDecoder's sigma semantics).
    """
    h, w = hw
    f = feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6)
    sim = f @ f.T
    if sim_bin_thr > 0:
        sim = jnp.where(sim > sim_bin_thr, sim, 0.0)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)
    d2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
    sigma = sigma_factor * jnp.sqrt(jnp.asarray(float(h * w)))
    spatial = jnp.exp(-d2 / jnp.maximum(2.0 * sigma**2, 1e-6))
    aff = jnp.clip(sim, 0.0) * spatial
    # zero the diagonal: a pixel should not message itself
    return aff * (1.0 - jnp.eye(h * w))


def mean_field_refine(
    attn_maps: jnp.ndarray,
    feats: jnp.ndarray,
    num_iter: int = 10,
    sigma_factor: float = 0.5,
    unary_weight: float = 1.0,
    pairwise_weight: float = 1.0,
) -> jnp.ndarray:
    """Refine per-instance maps with mean-field iterations.

    Args:
        attn_maps: (G, H, W) nonneg per-instance attention/unary maps
            (a background slot is appended internally).
        feats: (H*W, D) patch features.

    Returns:
        (G, H, W) refined probability maps (softmax over G+1 with the
        background slot dropped).
    """
    g, h, w = attn_maps.shape
    aff = feature_affinity(feats, (h, w), sigma_factor)
    norm = jnp.maximum(aff.sum(-1, keepdims=True), 1e-6)
    msg_op = aff / norm  # row-stochastic message matrix

    fg = attn_maps.reshape(g, -1)
    bg = jnp.maximum(1.0 - fg.max(0, keepdims=True), 0.0)
    unary = jnp.log(jnp.concatenate([fg, bg], axis=0) + 1e-6)  # (G+1, N)

    def step(q, _):
        msg = q @ msg_op.T  # (G+1, N) neighbourhood consensus
        logits = unary_weight * unary + pairwise_weight * jnp.log(msg + 1e-6)
        q = jax.nn.softmax(logits, axis=0)
        return q, None

    q0 = jax.nn.softmax(unary, axis=0)
    q, _ = jax.lax.scan(step, q0, None, length=num_iter)
    return q[:g].reshape(g, h, w)


def water_fill(
    feats: jnp.ndarray,
    sim_inter: jnp.ndarray,
    attns_in: jnp.ndarray,
    n_iter: int = 1,
    thr: float | None = None,
):
    """Greedy coverage-based prototype extraction ("water fill").

    Rebuild of ``water_fill`` / ``water_fill_adaptive``
    (`mmdet_plugins/utils/crf.py:147-188`): per iteration, pick the
    feature whose (thresholded) similarity row covers the most remaining
    attention mass, emit it as a prototype, and drain the attention it
    covers. Fixed ``n_iter`` prototype slots with a validity mask replace
    the reference's data-dependent early break.

    Args:
        feats: (N, D) patch features.
        sim_inter: (N, N) pairwise similarity.
        attns_in: (N,) nonnegative attention mass to cover.
        thr: absolute threshold on similarities (``water_fill_adaptive``);
            None = relative ``0.8 * row max`` (``water_fill``).

    Returns:
        prototypes (n_iter, D), valid (n_iter,) bool (slot 0 always
        valid, matching the reference's ``S > 0 or i == 0``).
    """
    if thr is None:
        row_max = sim_inter.max(axis=1, keepdims=True)
        sim = jnp.where(sim_inter < row_max * 0.8, 0.0, sim_inter)
    else:
        sim = jnp.where(sim_inter <= thr, 0.0, sim_inter)

    def step(attn, i):
        s_in = sim @ attn  # (N,) coverage of remaining mass
        score = s_in.max()
        idx = jnp.argmax(s_in)
        ok = (score > 0) | (i == 0)
        covered = (sim[idx] > 0).astype(attn.dtype)
        attn = jnp.clip(attn - covered * (attn > 0), 0.0, 1.0)
        return attn, (feats[idx], ok)

    _, (prots, valid) = jax.lax.scan(
        step, attns_in.astype(jnp.float32), jnp.arange(n_iter)
    )
    # once a slot is invalid, all later slots are too (the `break`)
    valid = jnp.cumprod(valid.astype(jnp.int32)) > 0
    return prots, valid


__all__ += ["water_fill"]
