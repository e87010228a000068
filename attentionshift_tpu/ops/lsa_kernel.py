"""On-chip Hungarian assignment as one Pallas kernel.

``core.lsa.linear_sum_assignment`` runs the e-maxx shortest-augmenting-
path algorithm with ``lax`` loops; exact, but every Dijkstra iteration
is ~15 dependent micro-ops on (100,)-sized vectors, and XLA dispatches
each as its own fused op — ~0.76 ms/step of pure serialization at the
20x100 bench shape (round-4 trace, `core/lsa.py:82,112`). This kernel
runs the IDENTICAL algorithm inside one pallas_call: the whole state
lives in VMEM and the loop body compiles to straight-line vector code.

Semantics match ``linear_sum_assignment`` exactly (same iteration
structure, same tie behavior via min-index argmin); the fuzz suite pins
both against scipy.

Layout notes: row-indexed state (u, on-path flags, the output) lives as
(n, 1) COLUMN vectors and column-indexed state (v, p, minv, used, way)
as (1, m) ROW vectors, so every cross construction is a broadcasted
(n, m) compare + axis reduction — no in-kernel transposes or gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=16 * 1024 * 1024)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None

__all__ = ["linear_sum_assignment_kernel"]

_INF = 1e30  # python float: a jnp scalar here becomes a captured const


def _kernel(cost_ref, rv_ref, out_ref, *, n, m, use_valid):
    cost = cost_ref[...]  # (n, m) f32
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)  # (1, m)
    row_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (n, 1)
    rows_nm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)

    def sel_row(mat, i):
        # (n, m) -> row i as (1, m)
        return jnp.sum(
            jnp.where(rows_nm == i, mat, 0.0), axis=0, keepdims=True)

    def at_col(vec, j):
        # (1, m) -> scalar element j (as f32)
        return jnp.sum(jnp.where(col_iota == j, vec.astype(jnp.float32), 0.0))

    def at_row(vec, i):
        # (n, 1) -> scalar element i (as f32)
        return jnp.sum(jnp.where(row_col == i, vec.astype(jnp.float32), 0.0))

    def solve_row(i, state):
        u, v, p = state  # (n,1) f32, (1,m) f32, (1,m) s32

        def dj_cond(s):
            return jnp.logical_not(s[7])

        def dj_body(s):
            u, v, minv, used, way, i0, j0, _ = s
            cur = sel_row(cost, i0) - at_row(u, i0) - v  # (1, m)
            better = jnp.logical_not(used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            cand = jnp.where(used, _INF, minv)
            cmin = jnp.min(cand)
            j1 = jnp.min(jnp.where(cand == cmin, col_iota, m))
            j1_used = at_col(used, j1) > 0
            delta = jnp.where(j1_used, 0.0, cmin)
            # rows on the alternating tree: matched rows of used cols + i
            hit = (used & (p >= 0)).astype(jnp.int32)  # (1, m)
            onp = jnp.max(
                jnp.where(p == rows_nm, hit, 0), axis=1, keepdims=True
            )  # (n, 1): row r hit by some used column matched to it
            on_path = (onp > 0) | (row_col == i)  # (n, 1)
            u = jnp.where(on_path, u + delta, u)
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            used = used | (col_iota == j1)
            nxt = jnp.int32(at_col(p, j1))
            done = nxt < 0
            i0 = jnp.where(done, i0, nxt)
            return u, v, minv, used, way, i0, j1, done

        minv0 = jnp.full((1, m), _INF)
        used0 = jnp.zeros((1, m), jnp.bool_)
        way0 = jnp.full((1, m), -1, jnp.int32)
        u, v, _, _, way, _, j_free, _ = jax.lax.while_loop(
            dj_cond, dj_body,
            (u, v, minv0, used0, way0, i, jnp.int32(-1), jnp.bool_(False)),
        )

        def aug_cond(s):
            return s[0] >= 0

        def aug_body(s):
            j0, p = s
            j1 = jnp.int32(at_col(way, j0))
            prev = jnp.int32(at_col(p, jnp.maximum(j1, 0)))
            new_row = jnp.where(j1 < 0, i, prev)
            p = jnp.where(col_iota == j0, new_row, p)
            return j1, p

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j_free, p))
        return u, v, p

    if use_valid:
        def body(i, state):
            return jax.lax.cond(
                at_row(rv_ref[...], i) > 0,
                lambda: solve_row(i, state), lambda: state,
            )
    else:
        body = solve_row

    u0 = jnp.zeros((n, 1), jnp.float32)
    v0 = jnp.zeros((1, m), jnp.float32)
    p0 = jnp.full((1, m), -1, jnp.int32)
    _, _, p = jax.lax.fori_loop(0, n, body, (u0, v0, p0))

    # invert: col assigned to each row (-1 = unmatched), as (n, 1)
    cols_nm = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    out_ref[...] = jnp.max(
        jnp.where(p == rows_nm, cols_nm, -1), axis=1, keepdims=True)


def linear_sum_assignment_kernel(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ``core.lsa.linear_sum_assignment`` (single problem)."""
    n, m = cost.shape
    rv = (jnp.ones((n, 1), jnp.float32) if row_valid is None
          else row_valid.astype(jnp.float32)[:, None])
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, m=m, use_valid=row_valid is not None),
        in_specs=[
            pl.BlockSpec((n, m), lambda: (0, 0)),
            pl.BlockSpec((n, 1), lambda: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n, 1), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(cost.astype(jnp.float32), rv)
    return out[:, 0]
