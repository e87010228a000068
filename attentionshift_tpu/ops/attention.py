"""Fused attention kernel that also emits head-averaged probabilities.

The reference materialises every block's full per-head (T, T) softmax
matrix in HBM just to keep a head-averaged copy for the pseudo-label
engine (`models/vision_transformer.py:79-86`). On TPU that burns
``H x T^2`` HBM traffic per block. This Pallas kernel computes

    out        = softmax(q k^T / sqrt(d)) v          (per head)
    mean_probs = mean_h softmax(.)                   (head-averaged, f32)

in one pass: for each (batch, query-tile) the whole K/V of one head is
VMEM-resident (T up to ~4.5k keys x 64 dims fits easily), heads iterate
in the innermost grid dimension accumulating into the same mean block —
the per-head (T, T) tensor never exists in HBM.

Backward (custom_vjp) recomputes probabilities with plain XLA ops — the
same cost the reference pays under checkpointing; ``mean_probs`` is
non-differentiable by construction (the engine consumes it detached).

Falls back to a pure-jnp implementation off-TPU (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_with_capture", "attention_no_capture"]


def _jnp_reference(q, k, v):
    """(B, H, T, d) -> (out (B,H,T,d), mean_probs (B,T,T) in q.dtype).

    The capture rides the storage dtype: in bf16 models the 7 captured
    (T, T) maps cost half the HBM writes (and the rollout's reads) of
    f32; probabilities are in [0, 1] and the rollout promotes to f32, so
    bf16's ~0.4% relative error is far below the engine's thresholds.
    """
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out, probs.mean(axis=1).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, out_ref, mean_ref, acc_ref, *, num_heads, t_real):
    h = pl.program_id(2)
    q = q_ref[0, 0]  # (TQ, d)
    k = k_ref[0, 0]  # (Tpad, d)
    v = v_ref[0, 0]
    d = q.shape[-1]
    # keep operands in their storage dtype (bf16 on the bench path) so the
    # MXU runs at native rate; accumulate in f32 and scale the f32 logits
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (d**-0.5)  # (TQ, Tpad)
    # mask padded keys
    tpad = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < t_real, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)

    # head-mean accumulates in an f32 VMEM scratch; the (possibly bf16)
    # HBM block is written once, by the last head
    contrib = probs * (1.0 / num_heads)

    @pl.when(h == 0)
    def _():
        acc_ref[...] = contrib

    @pl.when(h > 0)
    def _():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(h == num_heads - 1)
    def _():
        mean_ref[0] = acc_ref[...].astype(mean_ref.dtype)


def _pallas_forward(q, k, v, tile_q: int = 256):
    b, h, t, d = q.shape
    tpad = ((t + tile_q - 1) // tile_q) * tile_q
    pad = tpad - t
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        qp, kp, vp = q, k, v

    grid = (b, tpad // tile_q, h)  # heads innermost: mean block stays hot
    out, mean = pl.pallas_call(
        functools.partial(_kernel, num_heads=h, t_real=t),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
            jax.ShapeDtypeStruct((b, tpad, tpad), q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, d), lambda bi, qi, hi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, tpad, d), lambda bi, qi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, tpad, d), lambda bi, qi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile_q, d), lambda bi, qi, hi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, tile_q, tpad), lambda bi, qi, hi: (bi, qi, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((tile_q, tpad), jnp.float32)],
    )(qp, kp, vp)
    return out[:, :, :t], mean[:, :t, :t]


def _plain_kernel(q_ref, k_ref, v_ref, out_ref, *, t_real):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    d = q.shape[-1]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * (d**-0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < t_real, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_no_capture(q, k, v, use_pallas: bool = True):
    """Plain fused attention (no probability emission) — for the
    non-capture blocks, whose jnp path otherwise materialises the
    per-head (T, T) matrix in HBM."""
    if not (use_pallas and q.shape[-1] % 8 == 0):
        return _jnp_reference(q, k, v)[0]
    b, h, t, d = q.shape
    tile_q = 256
    tpad = ((t + tile_q - 1) // tile_q) * tile_q
    pad = tpad - t
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_plain_kernel, t_real=t),
        out_shape=jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
        grid=(b, tpad // tile_q, h),
        in_specs=[
            pl.BlockSpec((1, 1, tile_q, d), lambda bi, qi, hi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, tpad, d), lambda bi, qi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, tpad, d), lambda bi, qi, hi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_q, d), lambda bi, qi, hi: (bi, hi, qi, 0)),
    )(q, k, v)
    return out[:, :, :t]


def _nc_fwd(q, k, v, use_pallas):
    return attention_no_capture(q, k, v, use_pallas), (q, k, v)


def _nc_bwd(use_pallas, res, g_out):
    return _bwd(use_pallas, res, (g_out, None))


attention_no_capture.defvjp(_nc_fwd, _nc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_with_capture(q, k, v, use_pallas: bool = True):
    """Attention + detached head-averaged probs.

    Args:
        q/k/v: (B, H, T, d).

    Returns:
        out (B, H, T, d), mean_probs (B, T, T) f32 (stop-gradient).
    """
    if use_pallas and q.shape[-1] % 8 == 0:
        out, mean = _pallas_forward(q, k, v)
    else:
        out, mean = _jnp_reference(q, k, v)
    return out, jax.lax.stop_gradient(mean)


def _fwd(q, k, v, use_pallas):
    out, mean = attention_with_capture(q, k, v, use_pallas)
    return (out, mean), (q, k, v)


def _bwd(use_pallas, res, grads):
    q, k, v = res
    # matmul operands stay in the storage dtype (bf16 on TPU) with f32
    # accumulation; softmax math is f32
    mm = q.dtype
    g_out = grads[0].astype(mm)  # mean_probs grad is zero
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    p = jax.nn.softmax(logits, axis=-1)
    pm = p.astype(mm)
    gv = jnp.einsum("bhts,bhtd->bhsd", pm, g_out, preferred_element_type=jnp.float32)
    gp = jnp.einsum(
        "bhtd,bhsd->bhts", g_out, v, preferred_element_type=jnp.float32
    )
    gl = p * (gp - (gp * p).sum(-1, keepdims=True))
    glm = gl.astype(mm)
    gq = jnp.einsum(
        "bhts,bhsd->bhtd", glm, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    gk = jnp.einsum(
        "bhts,bhtd->bhsd", glm, q, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    return gq.astype(q.dtype), gk.astype(k.dtype), gv.astype(v.dtype)


attention_with_capture.defvjp(_fwd, _bwd)
