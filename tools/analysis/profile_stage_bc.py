"""Sub-stage timing of Stages B+C at the benchmark shape."""

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
from attentionshift_tpu.pseudo.refine import (
    cosine_similarity_refined_map, sample_mask_points,
)
from attentionshift_tpu.pseudo.meanshift import semantic_centers

H, W, G, D = 800, 1344, 20, 384
HP, WP = H // 16, W // 16
STEPS = 10

rng = np.random.RandomState(0)
cams_patch = jnp.asarray(rng.rand(G, HP, WP), jnp.float32)
vit_feat = jnp.asarray(rng.randn(D, HP, WP), jnp.float32)
boxes = jnp.asarray(
    rng.rand(G, 4) * [W / 2, H / 2, W / 2, H / 2] + [0, 0, W / 2, H / 2],
    jnp.float32,
)
gt_points = jnp.asarray(rng.rand(G, 2) * [W, H], jnp.float32)
gt_labels = jnp.asarray(rng.randint(0, 20, (G,)), jnp.int32)
valid = jnp.asarray([True] * 8 + [False] * (G - 8))
key = jax.random.PRNGKey(0)


def sync(out):
    # scalar fetch drains the queue even where block_until_ready no-ops
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def bench(fn, *args, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name:<34s} {dt:8.2f} ms")
    return out


up = bench(jax.jit(lambda c: resize(c, (H, W))), cams_patch, name="cams resize patch->full (G maps)")

maps = bench(
    jax.jit(
        lambda k, c, f, b, p, v: cosine_similarity_refined_map(
            k, c, f, b, p, v, refine_times=2, obj_tau=0.9
        )
    ),
    key, up, vit_feat, boxes, gt_points, valid,
    name="cosine_similarity_refined_map",
)

bench(
    jax.jit(
        lambda k, fg, bg, b: sample_mask_points(
            k, fg, bg, b, num_gt=10, pos_thr=0.35, neg_thr=0.8, corr_size=21
        )
    ),
    key, maps.map_fg, maps.map_bg, boxes,
    name="sample_mask_points",
)

bench(
    jax.jit(
        lambda fg, bg, b, f, l, v: semantic_centers(
            fg, bg, b, f, l, v, pos_thr=0.35, n_shift=10, num_semantic_points=5
        )
    ),
    maps.map_fg, maps.map_bg, boxes, vit_feat, gt_labels, valid,
    name="semantic_centers",
)
