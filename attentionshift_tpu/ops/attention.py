"""Fused attention kernel that also emits head-averaged probabilities.

The reference materialises every block's full per-head (T, T) softmax
matrix in HBM just to keep a head-averaged copy for the pseudo-label
engine (`models/vision_transformer.py:79-86`). On TPU that burns
``H x T^2`` HBM traffic per block. This Pallas kernel computes

    out        = softmax(q k^T / sqrt(d)) v            (per head)
    mean_probs = mean_h softmax(.)   (head-averaged, storage dtype)

in one pass: the grid is (batch, query-tile) and ALL heads' K/V live in
VMEM for the whole batch element (~6.7 MB at ViT-S bench shape in bf16),
so K/V are DMA'd once per image rather than once per (q-tile, head);
heads iterate inside the kernel, accumulating the mean in registers —
the per-head (T, T) tensor never exists in HBM. bf16 inputs are assumed
for large T (f32 all-head K/V above ~10 MB can exceed VMEM; the bench
and train paths run bf16).

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
from jax.sharding import PartitionSpec as P

try:  # pallas TPU compiler knobs (absent on pure-CPU jax builds)
    from jax.experimental.pallas import tpu as pltpu

    # all-head-resident K/V plus f32 logits/probs/acc temps sit right at
    # the default 16 MB scoped-vmem budget at the bench shape (T=4352);
    # raise the cap so the compiler stops spilling/refusing the stack
    _COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None

__all__ = [
    "attention_with_capture",
    "attention_no_capture",
    "attention_with_capture_sharded",
    "attention_no_capture_sharded",
]


def _current_mesh():
    """The physical mesh of the enclosing ``with mesh:`` block, or None."""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        if not m.empty:
            return m
    except Exception:
        pass
    return None


def _interpret_default() -> bool:
    """Interpret-mode default off-mesh: real kernel only on TPU backends."""
    return jax.default_backend() != "tpu"


def _tp_layout(mesh, batch, heads):
    """(data_axis_or_None, tp) for head-sharded shard_map dispatch."""
    tp = int(mesh.shape.get("model", 1))
    if tp <= 1 or heads % tp:
        return None, 1
    data = "data" if ("data" in mesh.shape and batch % int(mesh.shape["data"]) == 0) else None
    return data, tp


def attention_with_capture_sharded(q, k, v, use_pallas: bool = True,
                                   pad_interval=None):
    """TP-composable capture attention.

    When the enclosing mesh has a >1 ``model`` axis that divides the head
    count, the fused kernel runs under ``shard_map`` with heads sharded on
    ``model`` (the natural Megatron split of the column-parallel qkv
    output) and the head-averaged capture reconstructed with one psum.
    Otherwise this is exactly ``attention_with_capture``. CPU meshes run
    the kernel in interpret mode (the multi-chip dryrun path).
    """
    mesh = _current_mesh()
    if mesh is None:
        return attention_with_capture(q, k, v, use_pallas, _interpret_default(),
                                      pad_interval)
    data, tp = _tp_layout(mesh, q.shape[0], q.shape[1])
    if tp == 1:
        return attention_with_capture(q, k, v, use_pallas, _interpret_default(),
                                      pad_interval)
    interpret = mesh.devices.flat[0].platform != "tpu"
    spec = P(data, "model", None, None)

    def f(ql, kl, vl):
        out, mean_local = attention_with_capture(ql, kl, vl, use_pallas, interpret,
                                                 pad_interval)
        # local mean is over H/tp heads; global mean = psum(local)/tp
        mean = jax.lax.psum(mean_local / tp, "model")
        return out, mean

    return jax.shard_map(
        f, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, P(data, None, None)), check_vma=False,
    )(q, k, v)


def attention_no_capture_sharded(q, k, v, use_pallas: bool = True,
                                 pad_interval=None):
    """TP-composable plain fused attention (see capture variant)."""
    mesh = _current_mesh()
    if mesh is None:
        return attention_no_capture(q, k, v, use_pallas, _interpret_default(),
                                    pad_interval)
    data, tp = _tp_layout(mesh, q.shape[0], q.shape[1])
    if tp == 1:
        return attention_no_capture(q, k, v, use_pallas, _interpret_default(),
                                    pad_interval)
    interpret = mesh.devices.flat[0].platform != "tpu"
    spec = P(data, "model", None, None)
    return jax.shard_map(
        lambda ql, kl, vl: attention_no_capture(ql, kl, vl, use_pallas, interpret,
                                                pad_interval),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _interval_mask(t, pad_interval):
    """(T,) additive f32 logit mask for a [lo, hi) pad-column interval."""
    lo, hi = pad_interval
    col = jnp.arange(t)
    return jnp.where((col >= lo) & (col < hi), -1e30, 0.0).astype(jnp.float32)


def _jnp_reference(q, k, v, pad_interval=None):
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
    if pad_interval is not None:
        logits = logits + _interval_mask(q.shape[2], pad_interval)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhts,bhsd->bhtd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out, probs.mean(axis=1).astype(q.dtype)


# Constant logit shift replacing the per-row max subtraction. Softmax is
# shift-invariant, so any constant is EXACT mathematically; numerically
# the kernel exponentiates with exp2 (the VPU's native base — measured
# 25% faster per layer than exp at the bench shape), which overflows at
# 2^128: logits scaled by log2(e) reach ~58 for |logit| <= 40 (far above
# anything a d^-0.5-scaled LN'd ViT produces), so a shift of 20 leaves
# ~90 doublings of headroom and the row sums stay < 1e18 << f32 max.
# Dropping the max pass removes a full-width VPU reduction per
# (head, tile); softmax(x) == 2^(x*log2e + c) / sum(...) exactly.
_SOFTMAX_SHIFT = 20.0
_LOG2E = 1.4426950408889634


def _pad_bias(t_pad, pad_lo, pad_hi, t_real=None):
    """(1, t_pad) additive bias: -shift on real columns, -1e30 on padding.

    Computed once per q-tile and broadcast-added — the per-head
    iota+compare+select over the full (TQ, Tpad) tile was 3 VPU passes
    x num_heads; this is one add per head. exp(logit - 1e30) == 0
    implements the pad mask for free inside the softmax.

    Padding is the half-open column interval [pad_lo, pad_hi): trailing
    for internally padded inputs (pad_lo = t_real, pad_hi = t_pad), or a
    mid-sequence gap when the model pre-pads the token axis between the
    patch and point tokens (models/vit.py ``pad_tokens_to``).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad), 1)
    real = (col < pad_lo) | (col >= pad_hi)
    if t_real is not None and t_real < t_pad:  # trailing internal padding too
        real = real & (col < t_real)
    return jnp.where(real, -_SOFTMAX_SHIFT, -1e30).astype(jnp.float32)


def _head_attn(q, k, v, bias, fold_div: bool):
    """One head's attention for a q tile.

    Operands stay in their storage dtype (bf16 on the bench path) so the
    MXU runs at native rate; accumulation is f32. With ``fold_div`` the
    softmax denominator is applied to the (TQ, d) output instead of the
    (TQ, Tpad) probabilities — one full-width VPU pass saved — and the
    returned probs are UNNORMALISED (caller must scale by recip).

    VPU-traffic choices (the kernel is VPU/VMEM-bound, not MXU-bound —
    round-3 shootout in tools/analysis/microbench_attention.py):
    - the d^-0.5*log2e scale is folded into the (TQ, d) q tile instead
      of a full-width multiply on the (TQ, Tpad) logits;
    - ``e`` is staged in the STORAGE dtype (bf16 on the bench/train
      path): every later wide read (row-sum, PV operand, capture
      contribution) moves half the bytes. Probabilities are in [0, 1]
      and the captured maps are stored bf16 anyway, so the 0.4% relative
      rounding matches the existing storage precision; f32 models (the
      CPU numerics tests) keep an exact f32 chain.
    Together: 0.99 -> 0.86 ms/layer at the bench shape.
    """
    d = q.shape[-1]
    qs = q * jnp.asarray(d**-0.5 * _LOG2E, q.dtype)
    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias  # (TQ, Tpad), log2-domain
    # Extreme-logit guards (both exact for any sane model; without them
    # a DIVERGING model feeds inf/NaN back into training, which plain
    # softmax's row-max subtraction would have absorbed — observed as
    # pallas-only NaN at step ~500 of the toy overfit run while the XLA
    # path stayed finite):
    # - overflow: exp2 overflows at 2^128; shifted logits of a sane
    #   model stay < 60, so min() is inert until |logit| ~ 70 (measured
    #   free: fused into the exp2 pass);
    # - underflow: a row whose max logit is < ~-73 underflows the whole
    #   sum to 0 and 1/sum to inf; max() keeps it finite (softmax row
    #   degrades to garbage-but-finite exactly when the model already
    #   produces garbage).
    e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(q.dtype)
    recip = 1.0 / jnp.maximum(
        jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True), 1e-30
    )  # (TQ, 1)
    p = e if fold_div else (e.astype(jnp.float32) * recip).astype(e.dtype)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if fold_div:
        out = out * recip
    return out, e, recip


def _kernel(q_ref, k_ref, v_ref, out_ref, mean_ref, *, num_heads, pad_lo, pad_hi,
            t_real=None):
    # heads iterate INSIDE the kernel: the K/V blocks cover all heads and
    # depend only on the batch index, so they are DMA'd once per batch
    # element and stay VMEM-resident across every q tile — the grid
    # formulation with heads as a grid axis re-fetched the full K/V per
    # (q-tile, head), ~17x more HBM traffic at the bench shape.
    bias = _pad_bias(k_ref.shape[2], pad_lo, pad_hi, t_real)
    acc = None
    for h in range(num_heads):
        out, e, recip = _head_attn(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], bias, fold_div=True
        )
        out_ref[0, h] = out.astype(out_ref.dtype)
        # normalise while accumulating: e * (recip / H) is one multiply,
        # the same cost the plain softmax division would have paid
        contrib = e.astype(jnp.float32) * (recip * (1.0 / num_heads))
        acc = contrib if acc is None else acc + contrib
    mean_ref[0] = acc.astype(mean_ref.dtype)


def _pallas_forward(q, k, v, tile_q: int = 128, interpret: bool = False,
                    pad_interval=None):
    b, h, t, d = q.shape
    tpad = ((t + tile_q - 1) // tile_q) * tile_q
    pad = tpad - t
    # pad_interval: the caller pre-padded the token axis (vit.py
    # pad_tokens_to) with a zero gap at [pad_lo, pad_hi) — masked via the
    # bias, no pad/slice copies here (pad == 0 when t is tile-aligned)
    pad_lo, pad_hi = pad_interval if pad_interval is not None else (t, tpad)
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    else:
        qp, kp, vp = q, k, v

    grid = (b, tpad // tile_q)
    out, mean = pl.pallas_call(
        functools.partial(
            _kernel, num_heads=h, pad_lo=pad_lo, pad_hi=pad_hi, t_real=t
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
            jax.ShapeDtypeStruct((b, tpad, tpad), q.dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, tile_q, tpad), lambda bi, qi: (bi, qi, 0)),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(qp, kp, vp)
    if pad:
        return out[:, :, :t], mean[:, :t, :t]
    return out, mean


def _plain_kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads, pad_lo, pad_hi,
                  t_real=None):
    # same resident-K/V head loop as ``_kernel`` (see comment there)
    bias = _pad_bias(k_ref.shape[2], pad_lo, pad_hi, t_real)
    for h in range(num_heads):
        out, _, _ = _head_attn(
            q_ref[0, h], k_ref[0, h], v_ref[0, h], bias, fold_div=True
        )
        out_ref[0, h] = out.astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_no_capture(q, k, v, use_pallas: bool = True, interpret: bool = False,
                         pad_interval=None):
    """Plain fused attention (no probability emission) — for the
    non-capture blocks, whose jnp path otherwise materialises the
    per-head (T, T) matrix in HBM. ``interpret`` runs the kernel in
    Pallas interpret mode (CPU meshes under shard_map). ``pad_interval``
    marks a pre-padded zero token gap [lo, hi) to mask (vit.py
    ``pad_tokens_to``)."""
    if not (use_pallas and q.shape[-1] % 8 == 0):
        return _jnp_reference(q, k, v, pad_interval)[0]
    b, h, t, d = q.shape
    tile_q = 128
    tpad = ((t + tile_q - 1) // tile_q) * tile_q
    pad = tpad - t
    pad_lo, pad_hi = pad_interval if pad_interval is not None else (t, tpad)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(
            _plain_kernel, num_heads=h, pad_lo=pad_lo, pad_hi=pad_hi, t_real=t
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
        grid=(b, tpad // tile_q),
        in_specs=[
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(q, k, v)
    return out[:, :, :t] if pad else out


def _bwd_kernel_dq(q_ref, k_ref, v_ref, do_ref, dq_ref, recip_ref, dd_ref, *,
                   num_heads, pad_lo, pad_hi, t_real=None):
    """Backward pass A: one q-tile -> dQ tile + per-row recip/D.

    Flash-style: the (TQ, Tpad) probability/gradient tiles live only in
    VMEM; nothing (T, T)-shaped ever reaches HBM. Row sums (recip) and
    row dots (D = sum_s p*gp) are emitted for pass B, which processes
    key tiles and cannot afford full-row reductions.
    """
    bias = _pad_bias(k_ref.shape[2], pad_lo, pad_hi, t_real)
    d = q_ref.shape[-1]
    scale = jnp.asarray(d**-0.5 * _LOG2E, q_ref.dtype)
    for h in range(num_heads):
        qs = q_ref[0, h] * scale  # (TQ, d)
        s = jax.lax.dot_general(
            qs, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias  # (TQ, Tpad)
        e = jnp.exp2(jnp.minimum(s, 100.0)).astype(q_ref.dtype)
        recip = 1.0 / jnp.maximum(
            jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True), 1e-30
        )  # (TQ, 1) f32
        pm = (e.astype(jnp.float32) * recip).astype(e.dtype)
        gp = jax.lax.dot_general(
            do_ref[0, h], v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, Tpad)
        dd = jnp.sum(pm.astype(jnp.float32) * gp, axis=-1, keepdims=True)
        glm = (pm.astype(jnp.float32) * (gp - dd)).astype(e.dtype)
        dq = jax.lax.dot_general(
            glm, k_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (d**-0.5)
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        recip_ref[0, h] = recip[:, 0]
        dd_ref[0, h] = dd[:, 0]


def _bwd_kernel_dkv(q_ref, k_ref, v_ref, do_ref, recip_ref, dd_ref,
                    dk_ref, dv_ref, *, num_heads, pad_lo, pad_hi,
                    tile_s, t_real=None):
    """Backward pass B: one key tile -> dK/dV tiles.

    Recomputes the probability COLUMNS (all rows x this key tile) from
    resident Q/dO plus pass A's per-row recip/D; contracts over rows.
    The column pad mask must be applied here too (mid-sequence gap
    columns are NOT sliced away downstream — their dk/dv feed the qkv
    projection grads and must be exactly zero, as p == 0 there).
    """
    si = pl.program_id(1)
    d = q_ref.shape[-1]
    scale = jnp.asarray(d**-0.5 * _LOG2E, q_ref.dtype)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_s), 1) + si * tile_s
    real = (col < pad_lo) | (col >= pad_hi)
    if t_real is not None:
        real = real & (col < t_real)
    bias = jnp.where(real, -_SOFTMAX_SHIFT, -1e30).astype(jnp.float32)
    for h in range(num_heads):
        qs = q_ref[0, h] * scale  # (Tpad, d)
        s = jax.lax.dot_general(
            qs, k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias  # (Tpad, TS)
        e = jnp.exp2(jnp.minimum(s, 100.0))
        pm = (e * recip_ref[0, h][:, None]).astype(q_ref.dtype)  # (Tpad, TS)
        gp = jax.lax.dot_general(
            do_ref[0, h], v_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Tpad, TS)
        glm = (pm.astype(jnp.float32)
               * (gp - dd_ref[0, h][:, None])).astype(q_ref.dtype)
        dv = jax.lax.dot_general(
            pm, do_ref[0, h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TS, d)
        dk = jax.lax.dot_general(
            glm, q_ref[0, h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (d**-0.5)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _pallas_backward(q, k, v, g_out, tile_q: int = 128, interpret: bool = False,
                     pad_interval=None):
    """Flash-style attention backward: (dq, dk, dv), no (T, T) in HBM.

    Replaces the staged jnp backward for the pallas path: the staging
    form materialised 4+ (B, H, T, T) tensors per layer (~1.4 ms/layer
    bandwidth-bound at the bench shape, ~17 ms/step over 12 layers);
    both backward kernels keep every (T,)-wide tile VMEM-resident.
    Exactness: identical constant-shift exp2 recompute and f32
    accumulation as the staged form; parity pinned by
    ``test_attention_backward_matches_softmax_grads``.
    """
    b, h, t, d = q.shape
    tpad = ((t + tile_q - 1) // tile_q) * tile_q
    pad = tpad - t
    pad_lo, pad_hi = pad_interval if pad_interval is not None else (t, tpad)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        g_out = jnp.pad(g_out, ((0, 0), (0, 0), (0, pad), (0, 0)))

    dq, recip, dd = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dq, num_heads=h, pad_lo=pad_lo, pad_hi=pad_hi, t_real=t
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tpad), jnp.float32),
            jax.ShapeDtypeStruct((b, h, tpad), jnp.float32),
        ),
        grid=(b, tpad // tile_q),
        in_specs=[
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, qi: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, tile_q, d), lambda bi, qi: (bi, 0, qi, 0)),
            pl.BlockSpec((1, h, tile_q), lambda bi, qi: (bi, 0, qi)),
            pl.BlockSpec((1, h, tile_q), lambda bi, qi: (bi, 0, qi)),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(q, k, v, g_out)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel_dkv, num_heads=h, pad_lo=pad_lo, pad_hi=pad_hi,
            tile_s=tile_q, t_real=t,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, tpad, d), q.dtype),
        ),
        grid=(b, tpad // tile_q),
        in_specs=[
            pl.BlockSpec((1, h, tpad, d), lambda bi, si: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tile_q, d), lambda bi, si: (bi, 0, si, 0)),
            pl.BlockSpec((1, h, tile_q, d), lambda bi, si: (bi, 0, si, 0)),
            pl.BlockSpec((1, h, tpad, d), lambda bi, si: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, tpad), lambda bi, si: (bi, 0, 0)),
            pl.BlockSpec((1, h, tpad), lambda bi, si: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, tile_q, d), lambda bi, si: (bi, 0, si, 0)),
            pl.BlockSpec((1, h, tile_q, d), lambda bi, si: (bi, 0, si, 0)),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(q, k, v, g_out, recip, dd)

    if pad:
        return dq[:, :, :t], dk[:, :, :t], dv[:, :, :t]
    return dq, dk, dv


def _nc_fwd(q, k, v, use_pallas, interpret, pad_interval):
    return attention_no_capture(q, k, v, use_pallas, interpret, pad_interval), (q, k, v)


def _nc_bwd(use_pallas, interpret, pad_interval, res, g_out):
    return _bwd(use_pallas, interpret, pad_interval, res, (g_out, None))


attention_no_capture.defvjp(_nc_fwd, _nc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_with_capture(q, k, v, use_pallas: bool = True, interpret: bool = False,
                           pad_interval=None):
    """Attention + detached head-averaged probs.

    Args:
        q/k/v: (B, H, T, d).
        pad_interval: optional [lo, hi) pre-padded token gap to mask.

    Returns:
        out (B, H, T, d), mean_probs (B, T, T) f32 (stop-gradient).
    """
    if use_pallas and q.shape[-1] % 8 == 0:
        out, mean = _pallas_forward(q, k, v, interpret=interpret,
                                    pad_interval=pad_interval)
    else:
        out, mean = _jnp_reference(q, k, v, pad_interval)
    return out, jax.lax.stop_gradient(mean)


def _fwd(q, k, v, use_pallas, interpret, pad_interval):
    out, mean = attention_with_capture(q, k, v, use_pallas, interpret, pad_interval)
    return (out, mean), (q, k, v)


def _bwd(use_pallas, interpret, pad_interval, res, grads):
    q, k, v = res
    if use_pallas and q.shape[-1] % 8 == 0:
        # flash-style two-kernel backward: nothing (T, T)-shaped
        # touches HBM (see _pallas_backward). The staged jnp form below
        # remains the exact-f32 fallback for non-pallas models.
        dq, dk, dv = _pallas_backward(
            q, k, v, grads[0].astype(q.dtype),
            interpret=interpret, pad_interval=pad_interval,
        )
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)
    # matmul operands AND the recomputed (T, T) stages ride the storage
    # dtype (bf16 on TPU) with f32 accumulation. The softmax recompute
    # uses the forward kernel's constant-shift exp2 scheme (row-max-free
    # with the same over/underflow guards): the row-max formulation
    # forced a full f32 (B, H, T, T) logits materialisation before the
    # reduction — at the bench shape that alone is 454MB/layer of HBM,
    # and the round-4 train-step trace put the block backward at
    # ~90 ms/step. Probabilities are in [0, 1]; bf16 staging of the
    # (T, T) tensors rounds GRADIENTS by ~0.4%, the precision the model
    # already trains at (f32 models keep an exact f32 chain since
    # mm == float32 there).
    mm = q.dtype
    g_out = grads[0].astype(mm)  # mean_probs grad is zero
    d = q.shape[-1]
    qs = q * jnp.asarray(d**-0.5 * _LOG2E, q.dtype)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", qs, k, preferred_element_type=jnp.float32
    ) - _SOFTMAX_SHIFT
    if pad_interval is not None:
        logits = logits + _interval_mask(q.shape[2], pad_interval)
    e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(mm)
    recip = 1.0 / jnp.maximum(
        jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True), 1e-30
    )  # (B, H, T, 1) f32
    pm = (e.astype(jnp.float32) * recip).astype(mm)
    gv = jnp.einsum("bhts,bhtd->bhsd", pm, g_out, preferred_element_type=jnp.float32)
    gp = jnp.einsum(
        "bhtd,bhsd->bhts", g_out, v, preferred_element_type=jnp.float32
    ).astype(mm)
    # D_t = sum_s p_ts * gp_ts, f32 accumulation from the staged tensors
    dd = jnp.einsum("bhts,bhts->bht", pm, gp,
                    preferred_element_type=jnp.float32)[..., None]
    glm = (pm.astype(jnp.float32)
           * (gp.astype(jnp.float32) - dd)).astype(mm)
    gq = jnp.einsum(
        "bhts,bhsd->bhtd", glm, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    gk = jnp.einsum(
        "bhts,bhtd->bhsd", glm, q, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    return gq.astype(q.dtype), gk.astype(k.dtype), gv.astype(v.dtype)


attention_with_capture.defvjp(_fwd, _bwd)
