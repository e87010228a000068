"""Calibrate dispatch/sync overhead of the active backend.

Times (a) a trivial jitted scalar op, (b) a pure HBM copy of a
Stage-B-sized tensor, and (c) the Stage-B resize, so kernel time can be
separated from per-call dispatch latency (large on tunneled backends).
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

from attentionshift_tpu.ops.image import resize

STEPS = 30


def bench(fn, *args, name=""):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name:<34s} {dt:8.3f} ms")


rng = np.random.RandomState(0)
x_small = jnp.asarray(rng.randn(8, 8), jnp.float32)
x_big = jnp.asarray(rng.rand(20, 800, 1344), jnp.float32)
x_patch = jnp.asarray(rng.rand(20, 50, 84), jnp.float32)

bench(jax.jit(lambda x: x + 1.0), x_small, name="null op (8x8 add)")
bench(jax.jit(lambda x: x * 2.0 + 1.0), x_big, name="HBM pass (20x800x1344 fma)")
bench(jax.jit(lambda x: jnp.max(x, axis=(-2, -1))), x_big, name="HBM reduce (20x800x1344 max)")
bench(jax.jit(lambda c: resize(c, (800, 1344))), x_patch, name="resize 50x84->800x1344 (20)")
bench(
    jax.jit(lambda c: resize(c, (800, 1344)).astype(jnp.bfloat16)),
    x_patch.astype(jnp.bfloat16),
    name="resize bf16 in/out",
)


# MXU roofline: big bf16 matmul (same order as one ViT block's attention)
m1 = jnp.asarray(rng.randn(4352, 4352), jnp.bfloat16)
m2 = jnp.asarray(rng.randn(4352, 384), jnp.bfloat16)
bench(
    jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32)),
    m1, m1, name="matmul 4352^3 bf16 (165 GF)",
)
bench(
    jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32)),
    m1, m2, name="matmul 4352x4352x384 (14.6 GF)",
)
