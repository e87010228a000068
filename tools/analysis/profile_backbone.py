"""Backbone op-level timing at the benchmark shape.

Splits the ViT-S forward (15-16 ms at 800x1344) into its constituent
device costs, each timed as one jitted loop over layers so tunnel
dispatch overhead (~1.2 ms RTT) is amortised:

- capture attention kernel (7 layers' worth)
- no-capture attention kernel (5 layers' worth)
- qkv + proj + MLP matmuls (12 layers' worth)
- patchify + pyramid heads (once)

The sum approximates the full backbone; the residual vs
`profile_seed.py`'s backbone number is layernorm/elementwise/pipeline
bubbles.
"""

from __future__ import annotations

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

from attentionshift_tpu.ops.attention import (
    attention_no_capture,
    attention_with_capture,
)

B, H_, T, D = 1, 6, 4301, 64
E = H_ * D
STEPS = 10
ON_TPU = jax.devices()[0].platform != "cpu"

rng = np.random.RandomState(0)
q = jnp.asarray(rng.randn(B, H_, T, D), jnp.bfloat16)
k = jnp.asarray(rng.randn(B, H_, T, D), jnp.bfloat16)
v = jnp.asarray(rng.randn(B, H_, T, D), jnp.bfloat16)
x = jnp.asarray(rng.randn(B, T, E), jnp.bfloat16)
w_qkv = jnp.asarray(rng.randn(E, 3 * E) * 0.02, jnp.bfloat16)
w_proj = jnp.asarray(rng.randn(E, E) * 0.02, jnp.bfloat16)
w_fc1 = jnp.asarray(rng.randn(E, 4 * E) * 0.02, jnp.bfloat16)
w_fc2 = jnp.asarray(rng.randn(4 * E, E) * 0.02, jnp.bfloat16)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(fn, *args, name="", per=1):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name:<40s} {dt:8.2f} ms  ({dt / per:6.3f} ms/layer)")
    return out


@jax.jit
def capture7(q, k, v):
    acc = jnp.zeros((B, T, T), jnp.bfloat16)
    o = q
    for i in range(7):
        o, m = attention_with_capture(o, k, v, ON_TPU)
        acc = acc + m
    return o, acc


@jax.jit
def nocapture5(q, k, v):
    o = q
    for i in range(5):
        o = attention_no_capture(o, k, v, ON_TPU)
    return o


@jax.jit
def mlps12(x):
    o = x
    for i in range(12):
        qkv = o @ w_qkv
        o = qkv[..., :E] @ w_proj
        o = jax.nn.gelu(o @ w_fc1) @ w_fc2
    return o


bench(capture7, q, k, v, name="capture attention x7", per=7)
bench(nocapture5, q, k, v, name="no-capture attention x5", per=5)
bench(mlps12, x, name="qkv+proj+mlp x12", per=12)
