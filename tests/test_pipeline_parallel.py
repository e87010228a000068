"""Pipeline parallelism (parallel/pp.py): GPipe schedule equivalence.

The reference has no PP (SURVEY.md section 2.11); this validates the
TPU-native extension: S ViT blocks split one-per-stage over the mesh's
``model`` axis must produce bit-level the same result as running the
blocks sequentially, for any M >= 1 microbatches, with the microbatch
batch dim simultaneously sharded over ``data``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionshift_tpu.models.layers import Block
from attentionshift_tpu.parallel.mesh import make_mesh
from attentionshift_tpu.parallel.pp import (
    gpipe,
    shard_stage_params,
    stack_stage_params,
)

pytestmark = pytest.mark.slow  # shard_map + fori_loop compile


DIM, HEADS, TOK = 32, 2, 16


def _blocks_and_inputs(n_stages, m, batch):
    block = Block(num_heads=HEADS, mlp_ratio=2.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, batch, TOK, DIM), jnp.float32)
    per_stage = [
        block.init(jax.random.PRNGKey(i), x[0])["params"] for i in range(n_stages)
    ]
    return block, per_stage, x


def test_gpipe_matches_sequential_dp_x_pp():
    """4 pipeline stages x 2-way data parallel on the 8-CPU mesh."""
    mesh = make_mesh(jax.devices("cpu")[:8], model=4)
    block, per_stage, x = _blocks_and_inputs(n_stages=4, m=4, batch=2)

    # sequential reference: every microbatch through all 4 blocks in order
    def seq_one(mb):
        for p in per_stage:
            mb, _ = block.apply({"params": p}, mb)
        return mb

    expected = jnp.stack([seq_one(x[i]) for i in range(x.shape[0])])

    stacked = shard_stage_params(stack_stage_params(per_stage), mesh)

    def stage_fn(params, mb):
        return block.apply({"params": params}, mb)[0]

    with mesh:
        got = jax.jit(
            lambda p, xx: gpipe(
                stage_fn, p, xx, mesh=mesh, axis="model", data_axis="data"
            )
        )(stacked, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_gpipe_more_microbatches_than_stages():
    """M > S exercises the steady-state region of the schedule; S=2 keeps
    a second mesh-shape compile cheap."""
    mesh = make_mesh(jax.devices("cpu")[:4], model=2)
    block, per_stage, x = _blocks_and_inputs(n_stages=2, m=5, batch=1)

    def seq_one(mb):
        for p in per_stage:
            mb, _ = block.apply({"params": p}, mb)
        return mb

    expected = jnp.stack([seq_one(x[i]) for i in range(x.shape[0])])
    stacked = shard_stage_params(stack_stage_params(per_stage), mesh)

    def stage_fn(params, mb):
        return block.apply({"params": params}, mb)[0]

    with mesh:
        got = jax.jit(
            lambda p, xx: gpipe(stage_fn, p, xx, mesh=mesh, axis="model")
        )(stacked, x)

    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)
