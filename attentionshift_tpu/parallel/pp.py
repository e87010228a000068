"""Pipeline parallelism (GPipe-style) over the mesh's ``model`` axis.

The reference has no pipeline parallelism (SURVEY.md section 2.11 — DDP
only), and the flagship ViT-S fits one chip, so PP is off the parity
path. It IS the TPU-native scaling story for deeper backbones (ViT-L/H
at high resolution): split the block stack into S stages, one stage per
mesh slice, and stream M microbatches through them so all stages compute
concurrently after an S-1-step fill bubble.

Design (the standard SPMD GPipe schedule, expressed with ``shard_map`` +
``ppermute`` over ICI — no process-level pipelining machinery):

- stage parameters are STACKED on a leading axis of extent S and sharded
  over ``axis``, so each device slice holds exactly its stage's weights;
- a single program runs on every slice: at step ``t`` stage 0 ingests
  microbatch ``t`` while stage ``s`` processes the activation it
  received from stage ``s-1``; activations rotate forward with one
  ``ppermute`` per step (a neighbour hop on the ICI torus);
- the last stage scatters its result into the output buffer; after
  ``M + S - 1`` steps the buffer is complete and is broadcast with one
  ``psum`` (callers that keep going in parallel can skip it and consume
  the last slice's shard directly).

Bubble fraction is ``(S-1)/(M+S-1)`` — choose ``M >= 4*S`` for >75%
utilisation, exactly the trade the scaling-book schedule describes.

Composes with the repo's other axes: the microbatch BATCH dim may be
sharded over ``data`` (pass ``data_axis='data'``), and the stage
function may internally use tensor-parallel weights — the two schedules
are orthogonal (TP shards within a stage, PP across stages).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gpipe", "gpipe_aux", "stack_stage_params", "shard_stage_params"]


def stack_stage_params(per_stage: list[Any]) -> Any:
    """Stack S per-stage parameter pytrees on a new leading axis."""
    return jax.tree.map(lambda *leaves: jnp.stack(leaves, axis=0), *per_stage)


def shard_stage_params(stacked: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place stacked stage params with the leading axis over ``axis``."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stage_params: Any,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    axis: str = "model",
    data_axis: str | None = None,
) -> jnp.ndarray:
    """Run ``S = mesh.shape[axis]`` pipeline stages over microbatches.

    Args:
        stage_fn: ``(params_for_one_stage, mb) -> mb`` — one stage's
            computation on one microbatch; output shape/dtype must equal
            the input's (the homogeneous-block case, e.g. a slice of a
            ViT block stack).
        stage_params: pytree whose leaves carry a leading stage axis of
            extent S (see ``stack_stage_params``).
        x: (M, mb, ...) — M microbatches.
        mesh: active device mesh.
        axis: mesh axis to pipeline over.
        data_axis: optional mesh axis sharding the microbatch batch dim
            (x's SECOND axis), composing PP with data parallelism.

    Returns:
        (M, mb, ...) outputs, replicated over ``axis``.
    """
    s = int(mesh.shape[axis])
    m = int(x.shape[0])
    if s == 1:
        return jax.lax.map(lambda mb: stage_fn(jax.tree.map(lambda p: p[0], stage_params), mb), x)

    x_spec = P(None, data_axis, *([None] * (x.ndim - 2)))
    param_specs = jax.tree.map(lambda _: P(axis), stage_params)

    def body(params, xs):
        # each slice sees a leading stage axis of extent 1: its own stage
        params = jax.tree.map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == s - 1
        state = jnp.zeros(xs.shape[1:], xs.dtype)
        out = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % s) for i in range(s)]

        def step(t, carry):
            state, out = carry
            # stage 0 ingests microbatch t (clamped past the drain tail —
            # those results never land in the valid write window below)
            inp = jnp.where(is_first, xs[jnp.clip(t, 0, m - 1)], state)
            y = stage_fn(params, inp).astype(xs.dtype)
            w = t - (s - 1)
            valid = jnp.logical_and(is_last, jnp.logical_and(w >= 0, w < m))
            written = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(w, 0, m - 1), 0
            )
            out = jnp.where(valid, written, out)
            state = jax.lax.ppermute(y, axis, perm)
            return state, out

        _, out = jax.lax.fori_loop(0, m + s - 1, step, (state, out))
        # only the last stage holds real outputs; one broadcast completes
        return jax.lax.psum(jnp.where(is_last, out, jnp.zeros_like(out)), axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(stage_params, x)


def gpipe_aux(
    stage_fn: Callable[[Any, jnp.ndarray], tuple[jnp.ndarray, Any]],
    stage_params: Any,
    x: jnp.ndarray,
    aux_shape: Any,
    *,
    mesh: Mesh,
    axis: str = "model",
    data_axis: str | None = None,
) -> tuple[jnp.ndarray, Any]:
    """GPipe with per-stage side outputs that are NOT pipelined.

    Same schedule as :func:`gpipe`, but ``stage_fn`` returns
    ``(y, aux)`` and each stage's aux lands in a stage-LOCAL buffer —
    no ppermute ever moves it (capture maps are far larger than the
    activations; shipping them around the ring would dwarf the
    pipeline itself). The backbone's attention-capture PP mode
    (models/vit.py ``vit_forward_pp``) is the consumer.

    Args:
        stage_fn: ``(params_for_one_stage, mb) -> (mb_out, aux)``;
            ``aux`` is a pytree with shapes/dtypes matching
            ``aux_shape`` (ShapeDtypeStructs or example arrays).
        aux_shape: pytree of per-(stage, microbatch) aux shapes.

    Returns:
        out: (M, mb, ...) trunk outputs, replicated over ``axis``.
        aux: pytree with leaves (S, M, *leaf_shape): stage s's aux on
            microbatch m — sharded stage-major over ``axis``.
    """
    s = int(mesh.shape[axis])
    m = int(x.shape[0])
    if s == 1:
        p0 = jax.tree.map(lambda p: p[0], stage_params)
        ys, auxs = [], []
        for i in range(m):
            y, a = stage_fn(p0, x[i])
            ys.append(y)
            auxs.append(a)
        out = jnp.stack(ys)
        aux = jax.tree.map(lambda *ls: jnp.stack(ls)[None], *auxs)
        return out, aux

    x_spec = P(None, data_axis, *([None] * (x.ndim - 2)))
    param_specs = jax.tree.map(lambda _: P(axis), stage_params)

    def aux_spec_of(leaf):
        # (1, M, *leaf) local -> (S, M, *leaf) global, stage-major
        return P(axis, None, *([None] * (len(leaf.shape))))

    aux_specs = jax.tree.map(aux_spec_of, aux_shape)

    def body(params, xs):
        params = jax.tree.map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        is_first = idx == 0
        is_last = idx == s - 1
        state = jnp.zeros(xs.shape[1:], xs.dtype)
        out = jnp.zeros_like(xs)
        aux_buf = jax.tree.map(
            lambda l: jnp.zeros((1, m) + tuple(l.shape), l.dtype), aux_shape
        )
        perm = [(i, (i + 1) % s) for i in range(s)]

        def step(t, carry):
            state, out, aux_buf = carry
            inp = jnp.where(is_first, xs[jnp.clip(t, 0, m - 1)], state)
            y, aux_t = stage_fn(params, inp)
            y = y.astype(xs.dtype)
            # this stage processed microbatch t - idx at step t
            wa = t - idx
            aux_valid = jnp.logical_and(wa >= 0, wa < m)
            wa_c = jnp.clip(wa, 0, m - 1)

            def put(buf, val):
                upd = jax.lax.dynamic_update_index_in_dim(
                    buf, val.astype(buf.dtype)[None], wa_c, 1
                )
                return jnp.where(aux_valid, upd, buf)

            aux_buf = jax.tree.map(put, aux_buf, aux_t)
            w = t - (s - 1)
            valid = jnp.logical_and(is_last, jnp.logical_and(w >= 0, w < m))
            written = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(w, 0, m - 1), 0
            )
            out = jnp.where(valid, written, out)
            state = jax.lax.ppermute(y, axis, perm)
            return state, out, aux_buf

        _, out, aux_buf = jax.lax.fori_loop(
            0, m + s - 1, step, (state, out, aux_buf)
        )
        out = jax.lax.psum(jnp.where(is_last, out, jnp.zeros_like(out)), axis)
        return out, aux_buf

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, x_spec),
        out_specs=(x_spec, aux_specs),
        check_vma=False,
    )(stage_params, x)
