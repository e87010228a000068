"""Sub-stage timing of Stage A at the benchmark shape.

Splits Stage A (9-11 ms at 800x1344) into: attention rollout over the
captured maps, the CAM->CCL->box candidate extraction, and the MIL RoI
featurisation, each timed in isolation on the local accelerator.
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

from attentionshift_tpu.ops.roi_align import roi_align
from attentionshift_tpu.pseudo.engine import candidate_boxes
from attentionshift_tpu.pseudo.rollout import attention_rollout_point_rows

H, W, G, D, P, L = 800, 1344, 20, 384, 100, 7
HP, WP = H // 16, W // 16
T = 1 + HP * WP + P
STEPS = 10
ON_TPU = jax.devices()[0].platform != "cpu"

rng = np.random.RandomState(0)
attns = jax.nn.softmax(
    jnp.asarray(rng.randn(L, 1, T, T), jnp.float32), axis=-1
).astype(jnp.bfloat16)
tok = jnp.asarray(rng.randint(0, P, (G,)), jnp.int32)
gt_points = jnp.asarray(rng.rand(G, 2) * [W, H], jnp.float32)
roi_map = jnp.asarray(rng.randn(1, D, HP, WP), jnp.bfloat16)
cand = jnp.asarray(
    rng.rand(G * L, 4) * [W / 2, H / 2, W / 2, H / 2] + [0, 0, W / 2, H / 2],
    jnp.float32,
)


def sync(out):
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


rows = bench(
    jax.jit(lambda a: attention_rollout_point_rows(a, num_points=P)),
    attns, name=f"rollout ({L} bf16 {T}x{T} maps)",
)

bench(
    jax.jit(
        lambda r, t, p: candidate_boxes(
            r[:, 0], t, p, (HP, WP), (H, W), cam_stride=8,
            ccl_iters=64, use_pallas_ccl=ON_TPU,
        )
    ),
    rows, tok, gt_points, name="candidate_boxes (CAM/CCL/box)",
)

rois = jnp.concatenate(
    [jnp.zeros((G * L, 1), jnp.float32), cand], axis=1
)
bench(
    jax.jit(lambda f, r: roi_align(f, r, 1.0 / 16, output_size=7)),
    roi_map, rois, name=f"MIL roi_align ({G * L} rois)",
)
