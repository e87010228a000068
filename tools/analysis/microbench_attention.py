"""Microbenchmark: attention-kernel variants at the bench shape.

Round-3 perf work (VERDICT.md item 1a): the round-2 fused kernel floors
at ~0.74 ms/layer vs a ~0.35 ms MXU bound. This harness times candidate
decompositions head-to-head on the real chip so scheduling theories get
data before surgery:

  ours-capture    round-2 kernel, capture variant (the shipped one)
  ours-nocapture  round-2 kernel, no-capture variant
  stock-flash     jax.experimental.pallas.ops.tpu.flash_attention
                  (the JAX team's double-buffered k-tile pipeline)
  xla             plain jnp einsum attention (materialises (H,T,T))

Calls are CHAINED (o = f(o-derived inputs)) so CSE cannot collapse the
loop (round-2 measurement hazard, NOTES_ROUND2.md).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def sync(o):
    # scalar fetch: block_until_ready is a no-op on the tunneled axon
    # backend (see bench.py) — only a device->host value forces a drain
    return float(jnp.sum(jax.tree.leaves(o)[0][0, 0, :8].astype(jnp.float32)))


def time_fn(fn, args, iters=20, inner=10):
    """Median wall time of `inner` chained calls, in ms per call."""
    f = jax.jit(fn)
    sync(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(f(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3 / inner


def chain(single, inner):
    """Chain `inner` dependent calls of single(q,k,v)->out (B,H,T,d).

    ``lax.scan`` keeps the compile cost at ONE body regardless of depth
    and the carry dependency defeats CSE (pallas_call is pure, so an
    unrolled ``[f(x) for _ in range(n)]`` collapses to one call —
    round-2 measurement hazard, NOTES_ROUND2.md).
    """

    def fn(q, k, v):
        def body(o, _):
            return single(o.astype(q.dtype), k, v), ()

        o, _ = jax.lax.scan(body, q, None, length=inner)
        return o

    return fn


def time_slope(single, args, inner=32, iters=12):
    """ms per call from the SLOPE between a 2*inner and an inner chain.

    Each host sync through the tunneled backend costs tens of ms of RTT
    (round-4 measurement: ~24 ms); dividing one chain's wall time by its
    depth still leaves RTT/inner in the answer. The difference of two
    chain depths cancels every per-dispatch constant exactly.
    """
    t1 = time_fn(chain(single, inner), args, iters=iters, inner=1)
    t2 = time_fn(chain(single, 2 * inner), args, iters=iters, inner=1)
    return (t2 - t1) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=4301)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    b, h, t, d = 1, args.heads, args.t, args.dim
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)

    from attentionshift_tpu.ops import attention as att

    results = {}

    def run(name, single):
        ms = time_slope(single, (q, k, v), inner=args.inner)
        results[name] = ms
        print(f"{name:20s} {ms:8.3f} ms/layer", flush=True)

    want = set(args.variants.split(",")) if args.variants else None

    def sel(name):
        return want is None or name in want

    if sel("ours-nocapture"):
        run("ours-nocapture", lambda q, k, v: att.attention_no_capture(q, k, v))
    if sel("ours-capture"):
        run("ours-capture", lambda q, k, v: att.attention_with_capture(q, k, v)[0])
    if sel("stock-flash"):
        from jax.experimental.pallas.ops.tpu import flash_attention as fa

        tp128 = ((t + 127) // 128) * 128

        def stock(q, k, v):
            # stock kernel requires 128-divisible seq len; pad like ours
            if t != tp128:
                padw = ((0, 0), (0, 0), (0, tp128 - t), (0, 0))
                q, k, v = (jnp.pad(x, padw) for x in (q, k, v))
            o = fa.flash_attention(q, k, v, causal=False, sm_scale=d ** -0.5)
            return o[:, :, :t]

        run("stock-flash", stock)
    if sel("v2-bf16e"):
        # experimental: q pre-scaled per head tile, e stored bf16 (halves
        # every later wide read), fold_div PV, contrib from bf16 e
        import jax.experimental.pallas as pl
        from attentionshift_tpu.ops.attention import (
            _COMPILER_PARAMS, _LOG2E, _SOFTMAX_SHIFT, _pad_bias)

        def kern(q_ref, k_ref, v_ref, out_ref, mean_ref, *, nh):
            tpad = k_ref.shape[2]
            bias = _pad_bias(tpad, tpad, tpad)  # all real
            acc = None
            for hh in range(nh):
                dd = q_ref.shape[-1]
                qh = q_ref[0, hh] * jnp.asarray(dd ** -0.5 * _LOG2E, q_ref.dtype)
                logits = jax.lax.dot_general(
                    qh, k_ref[0, hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(jnp.bfloat16)
                s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                recip = 1.0 / jnp.maximum(s, 1e-30)
                o = jax.lax.dot_general(
                    e, v_ref[0, hh], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * recip
                out_ref[0, hh] = o.astype(out_ref.dtype)
                contrib = e.astype(jnp.float32) * (recip * (1.0 / nh))
                acc = contrib if acc is None else acc + contrib
            mean_ref[0] = acc.astype(mean_ref.dtype)

        def v2(q, k, v):
            bb, hh, tt, dd = q.shape
            tile = 128
            out, mean = pl.pallas_call(
                functools.partial(kern, nh=hh),
                out_shape=(
                    jax.ShapeDtypeStruct((bb, hh, tt, dd), q.dtype),
                    jax.ShapeDtypeStruct((bb, tt, tt), q.dtype),
                ),
                grid=(bb, tt // tile),
                in_specs=[
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, tile, tt), lambda bi, qi: (bi, qi, 0)),
                ),
                compiler_params=_COMPILER_PARAMS,
            )(q, k, v)
            return out

        run("v2-bf16e", v2)
    if sel("v3-nomin"):
        # v2 minus the overflow guard (measures the min()'s cost)
        import jax.experimental.pallas as pl
        from attentionshift_tpu.ops.attention import (
            _COMPILER_PARAMS, _LOG2E, _pad_bias)

        def kern3(q_ref, k_ref, v_ref, out_ref, mean_ref, *, nh):
            tpad = k_ref.shape[2]
            bias = _pad_bias(tpad, tpad, tpad)
            acc = None
            for hh in range(nh):
                dd = q_ref.shape[-1]
                qh = q_ref[0, hh] * jnp.asarray(dd ** -0.5 * _LOG2E, q_ref.dtype)
                logits = jax.lax.dot_general(
                    qh, k_ref[0, hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                e = jnp.exp2(logits).astype(jnp.bfloat16)
                s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
                recip = 1.0 / jnp.maximum(s, 1e-30)
                o = jax.lax.dot_general(
                    e, v_ref[0, hh], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * recip
                out_ref[0, hh] = o.astype(out_ref.dtype)
                contrib = e.astype(jnp.float32) * (recip * (1.0 / nh))
                acc = contrib if acc is None else acc + contrib
            mean_ref[0] = acc.astype(mean_ref.dtype)

        def v3(q, k, v):
            bb, hh, tt, dd = q.shape
            tile = 128
            out, mean = pl.pallas_call(
                functools.partial(kern3, nh=hh),
                out_shape=(
                    jax.ShapeDtypeStruct((bb, hh, tt, dd), q.dtype),
                    jax.ShapeDtypeStruct((bb, tt, tt), q.dtype),
                ),
                grid=(bb, tt // tile),
                in_specs=[
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, tile, tt), lambda bi, qi: (bi, qi, 0)),
                ),
                compiler_params=_COMPILER_PARAMS,
            )(q, k, v)
            return out

        run("v3-nomin", v3)
    if sel("v4-mxsum"):
        # v2 with the row-sum on the MXU (e_bf16 @ ones) instead of a VPU
        # reduction — frees a wide VPU pass
        import jax.experimental.pallas as pl
        from attentionshift_tpu.ops.attention import (
            _COMPILER_PARAMS, _LOG2E, _pad_bias)

        def kern4(q_ref, k_ref, v_ref, out_ref, mean_ref, *, nh):
            tpad = k_ref.shape[2]
            bias = _pad_bias(tpad, tpad, tpad)
            ones = jnp.ones((tpad, 8), jnp.bfloat16)
            acc = None
            for hh in range(nh):
                dd = q_ref.shape[-1]
                qh = q_ref[0, hh] * jnp.asarray(dd ** -0.5 * _LOG2E, q_ref.dtype)
                logits = jax.lax.dot_general(
                    qh, k_ref[0, hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    e, ones, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, :1]
                recip = 1.0 / jnp.maximum(s, 1e-30)
                o = jax.lax.dot_general(
                    e, v_ref[0, hh], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * recip
                out_ref[0, hh] = o.astype(out_ref.dtype)
                contrib = e.astype(jnp.float32) * (recip * (1.0 / nh))
                acc = contrib if acc is None else acc + contrib
            mean_ref[0] = acc.astype(mean_ref.dtype)

        def v4(q, k, v):
            bb, hh, tt, dd = q.shape
            tile = 128
            out, mean = pl.pallas_call(
                functools.partial(kern4, nh=hh),
                out_shape=(
                    jax.ShapeDtypeStruct((bb, hh, tt, dd), q.dtype),
                    jax.ShapeDtypeStruct((bb, tt, tt), q.dtype),
                ),
                grid=(bb, tt // tile),
                in_specs=[
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, tile, tt), lambda bi, qi: (bi, qi, 0)),
                ),
                compiler_params=_COMPILER_PARAMS,
            )(q, k, v)
            return out

        run("v4-mxsum", v4)
    if sel("v5-batched"):
        # all heads in ONE batched dot_general pair: exposes cross-head
        # parallelism to Mosaic as a single op instead of a Python loop
        # (the round-2 manual interleave was neutral; this lets the
        # scheduler do it). VMEM: logits f32 (H,128,T) ~13 MB at the
        # bench shape + e bf16 + resident K/V — near the physical limit,
        # so it either pipelines or dies; measure, don't guess.
        import jax.experimental.pallas as pl
        from attentionshift_tpu.ops.attention import (
            _COMPILER_PARAMS, _LOG2E, _pad_bias)

        def kern5(q_ref, k_ref, v_ref, out_ref, mean_ref, *, nh):
            tpad = k_ref.shape[2]
            bias = _pad_bias(tpad, tpad, tpad)[None]
            dd = q_ref.shape[-1]
            qs = q_ref[0] * jnp.asarray(dd ** -0.5 * _LOG2E, q_ref.dtype)
            logits = jax.lax.dot_general(
                qs, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) + bias  # (H, TQ, Tpad)
            e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(jnp.bfloat16)
            s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            recip = 1.0 / jnp.maximum(s, 1e-30)
            o = jax.lax.dot_general(
                e, v_ref[0], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * recip
            out_ref[0] = o.astype(out_ref.dtype)
            mean_ref[0] = jnp.mean(
                e.astype(jnp.float32) * recip, axis=0).astype(mean_ref.dtype)

        def v5(q, k, v):
            bb, hh, tt, dd = q.shape
            tile = 128
            out, mean = pl.pallas_call(
                functools.partial(kern5, nh=hh),
                out_shape=(
                    jax.ShapeDtypeStruct((bb, hh, tt, dd), q.dtype),
                    jax.ShapeDtypeStruct((bb, tt, tt), q.dtype),
                ),
                grid=(bb, tt // tile),
                in_specs=[
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, tile, tt), lambda bi, qi: (bi, qi, 0)),
                ),
                compiler_params=_COMPILER_PARAMS,
            )(q, k, v)
            return out

        run("v5-batched", v5)
    if sel("v6-fusedsum"):
        # row-sum folded INTO the PV matmul: V gets 8 all-ones columns
        # appended (d 64 -> 72; the MXU pads the contraction to 128 lanes
        # either way, so the extra columns are free) and the softmax
        # denominator falls out of the same dot that produces PV — the
        # full-width VPU row-sum pass disappears.
        import jax.experimental.pallas as pl
        from attentionshift_tpu.ops.attention import (
            _COMPILER_PARAMS, _LOG2E, _pad_bias)

        def kern6(q_ref, k_ref, v_ref, out_ref, mean_ref, *, nh):
            tpad = k_ref.shape[2]
            bias = _pad_bias(tpad, tpad, tpad)
            dd = q_ref.shape[-1]
            acc = None
            for hh in range(nh):
                qh = q_ref[0, hh] * jnp.asarray(dd ** -0.5 * _LOG2E, q_ref.dtype)
                logits = jax.lax.dot_general(
                    qh, k_ref[0, hh], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bias
                e = jnp.exp2(jnp.minimum(logits, 100.0)).astype(jnp.bfloat16)
                osum = jax.lax.dot_general(
                    e, v_ref[0, hh], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TQ, d+8): PV in [:d], row-sum in [d:]
                recip = 1.0 / jnp.maximum(osum[:, dd:dd + 1], 1e-30)
                out_ref[0, hh] = (osum[:, :dd] * recip).astype(out_ref.dtype)
                contrib = e.astype(jnp.float32) * (recip * (1.0 / nh))
                acc = contrib if acc is None else acc + contrib
            mean_ref[0] = acc.astype(mean_ref.dtype)

        def v6(q, k, v):
            bb, hh, tt, dd = q.shape
            tile = 128
            vx = jnp.concatenate(
                [v, jnp.ones((bb, hh, tt, 8), v.dtype)], axis=-1)
            out, mean = pl.pallas_call(
                functools.partial(kern6, nh=hh),
                out_shape=(
                    jax.ShapeDtypeStruct((bb, hh, tt, dd), q.dtype),
                    jax.ShapeDtypeStruct((bb, tt, tt), q.dtype),
                ),
                grid=(bb, tt // tile),
                in_specs=[
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, hh, tt, dd), lambda bi, qi: (bi, 0, 0, 0)),
                    pl.BlockSpec((1, hh, tt, dd + 8), lambda bi, qi: (bi, 0, 0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, hh, tile, dd), lambda bi, qi: (bi, 0, qi, 0)),
                    pl.BlockSpec((1, tile, tt), lambda bi, qi: (bi, qi, 0)),
                ),
                compiler_params=_COMPILER_PARAMS,
            )(q, k, vx)
            return out

        run("v6-fusedsum", v6)
    if sel("xla"):
        def xla(q, k, v):
            logits = jnp.einsum(
                "bhtd,bhsd->bhts", q * (d ** -0.5), k,
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum(
                "bhts,bhsd->bhtd", p.astype(v.dtype), v,
                preferred_element_type=jnp.float32).astype(q.dtype)

        run("xla", xla)

    print({k: round(v, 3) for k, v in sorted(results.items(), key=lambda x: x[1])})


if __name__ == "__main__":
    main()
