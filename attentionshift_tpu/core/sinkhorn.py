"""Sinkhorn optimal transport + semantic correspondence solver.

Rebuild of ``SemanticCorrSolver`` (`mmdet/models/utils/memory_bank.py:
219-408` — Sinkhorn-OT with Hough-style spatial message passing for
semantic correspondence between object part sets; unused on the runnable
path). The OT core is the standard log-domain Sinkhorn fixed point,
expressed as a ``lax.scan`` (vector ops only — TPU-friendly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sinkhorn", "semantic_correspondence"]


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
