"""Sinkhorn optimal transport + semantic correspondence solver.

Rebuild of ``SemanticCorrSolver`` (`mmdet/models/utils/memory_bank.py:
219-408` — Sinkhorn-OT with Hough-style spatial message passing for
semantic correspondence between object part sets; unused on the runnable
path). The OT core is the standard log-domain Sinkhorn fixed point,
expressed as a ``lax.scan`` (vector ops only — TPU-friendly);
``hough_matching`` adds the reference's regularised Hough voting
(`solve`/`pass_message`, `memory_bank.py:322-408`): correspondence
(p0 -> p1) is reinforced by neighbour pairs (p0+d -> p1+d) through a
joint 3x3 box filter over the 4-D (src, trg) grid, iterated with row
normalisation — here a sum of 9 shifted slices of the (H0, W0, H1, W1)
tensor (one fused XLA loop body, no gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sinkhorn", "semantic_correspondence", "hough_matching"]


def sinkhorn(
    cost: jnp.ndarray,
    mu: jnp.ndarray | None = None,
    nu: jnp.ndarray | None = None,
    epsilon: float = 0.05,
    num_iter: int = 50,
) -> jnp.ndarray:
    """Entropic-OT transport plan for a (N, M) cost matrix (log domain).

    mu/nu: optional marginals (default uniform). Returns (N, M) plan P
    with row sums ~mu and col sums ~nu.
    """
    n, m = cost.shape
    if mu is None:
        mu = jnp.full((n,), 1.0 / n)
    if nu is None:
        nu = jnp.full((m,), 1.0 / m)
    log_mu = jnp.log(jnp.maximum(mu, 1e-12))
    log_nu = jnp.log(jnp.maximum(nu, 1e-12))
    k = -cost / epsilon

    def step(carry, _):
        f, g = carry
        f = log_mu - jax.nn.logsumexp(k + g[None, :], axis=1)
        g = log_nu - jax.nn.logsumexp(k + f[:, None], axis=0)
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        step, (jnp.zeros((n,)), jnp.zeros((m,))), None, length=num_iter
    )
    return jnp.exp(k + f[:, None] + g[None, :])


def semantic_correspondence(
    feats_a: jnp.ndarray,
    feats_b: jnp.ndarray,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
    epsilon: float = 0.05,
    num_iter: int = 50,
):
    """Part-to-part correspondence between two feature sets.

    Cosine-distance cost -> Sinkhorn plan -> per-row argmax match.

    Args:
        feats_a: (N, D); feats_b: (M, D); valid masks optional.

    Returns:
        plan (N, M), match (N,) int32 best column per row.
    """
    na = feats_a / jnp.maximum(jnp.linalg.norm(feats_a, axis=-1, keepdims=True), 1e-6)
    nb = feats_b / jnp.maximum(jnp.linalg.norm(feats_b, axis=-1, keepdims=True), 1e-6)
    cost = 1.0 - na @ nb.T
    big = 1e3
    mu = nu = None
    if valid_a is not None:
        cost = jnp.where(valid_a[:, None], cost, big)
        mu = valid_a / jnp.maximum(valid_a.sum(), 1)
    if valid_b is not None:
        cost = jnp.where(valid_b[None, :], cost, big)
        nu = valid_b / jnp.maximum(valid_b.sum(), 1)
    plan = sinkhorn(cost, mu, nu, epsilon, num_iter)
    return plan, jnp.argmax(plan, axis=1).astype(jnp.int32)


def _neighbor_shift_sum(t: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 9 jointly-shifted copies of a (H0, W0, H1, W1) tensor.

    ``out[y0,x0,y1,x1] = sum_{dy,dx in {-1,0,1}} t[y0-dy,x0-dx,y1-dy,x1-dx]``
    with out-of-range contributions zero — the reference's
    ``pass_message`` accumulation (`memory_bank.py:344-357`), where the
    source and target grids shift TOGETHER (offset-consistency voting).
    """
    h0, w0, h1, w1 = t.shape
    tp = jnp.pad(t, ((1, 1), (1, 1), (1, 1), (1, 1)))
    out = jnp.zeros_like(t)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out + jax.lax.slice(
                tp,
                (1 - dy, 1 - dx, 1 - dy, 1 - dx),
                (1 - dy + h0, 1 - dx + w0, 1 - dy + h1, 1 - dx + w1),
            )
    return out


def hough_matching(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    num_iter: int = 1,
    num_smooth_iter: int = 3,
    dist_kernel: int = 5,
):
    """Regularised Hough matching between two feature grids.

    The geometric half of ``SemanticCorrSolver.solve``
    (`memory_bank.py:360-408`): cosine similarity ``Cu`` between all
    (src, trg) grid positions, a Chebyshev distance band mask
    (``max_pool2d(eye, dist_kernel)``) restricting the initial
    hypotheses, then ``num_iter`` rounds of: ``num_smooth_iter`` x
    (joint-3x3 neighbourhood average + row normalisation), followed by
    ``C = rownorm(Cu + votes)``.

    Args:
        f0: (H, W, D) source feature grid.
        f1: (H, W, D) target feature grid (same shape — the reference
            views both through one ``shape``, `memory_bank.py:371-383`).

    Returns:
        Cu: (H*W, H*W) raw cosine similarity; C: (H*W, H*W) the
        Hough-regularised correspondence (rows = source positions).
    """
    h, w, _ = f0.shape
    n = h * w
    a = f0.reshape(n, -1)
    b = f1.reshape(n, -1)
    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-4)
    b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-4)
    cu = a @ b.T  # (N, N)

    # dist_mask[i, j] = 1 iff Chebyshev distance between grid positions
    # i and j <= dist_kernel // 2 (the reference's max-pooled identity)
    yy, xx = jnp.mgrid[:h, :w]
    yy = yy.reshape(n)
    xx = xx.reshape(n)
    r = dist_kernel // 2
    cheb = jnp.maximum(
        jnp.abs(yy[:, None] - yy[None, :]), jnp.abs(xx[:, None] - xx[None, :])
    )
    dist_mask = (cheb <= r).astype(cu.dtype)

    count = _neighbor_shift_sum(jnp.ones((h, w, h, w), cu.dtype))
    c = cu * dist_mask

    def outer(c, _):
        def smooth(v, _):
            v = _neighbor_shift_sum(v.reshape(h, w, h, w)) / count
            v = v.reshape(n, n)
            return v / (v.sum(axis=1, keepdims=True) + 1e-4), None

        votes, _ = jax.lax.scan(smooth, c, None, length=num_smooth_iter)
        c = cu + votes
        return c / (c.sum(axis=1, keepdims=True) + 1e-4), None

    c, _ = jax.lax.scan(outer, c, None, length=num_iter)
    return cu, c
