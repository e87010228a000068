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


@pytest.mark.slow
@pytest.mark.medium
def test_vit_forward_pp_matches_plain():
    """The PP-staged backbone forward (vit_forward_pp, gpipe_aux over a
    dp2 x pp2 mesh) must reproduce the plain forward's full output
    contract: trunk tokens, captured attention, feature taps, FPN, and
    point heads."""
    import numpy as np

    from attentionshift_tpu.models.vit import VisionTransformerDet, vit_forward_pp
    from attentionshift_tpu.parallel.mesh import make_mesh

    model = VisionTransformerDet(
        img_size=32, embed_dim=32, depth=4, num_heads=2,
        out_indices=(0, 1, 2, 3), point_tokens_num=10, num_classes=5,
        capture_layers=3, drop_path_rate=0.1, use_remat=False,
        pad_tokens_to=128,
    )
    img = jnp.asarray(np.random.RandomState(0).randn(4, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    want = model.apply(variables, img)  # deterministic=True default

    mesh = make_mesh(jax.devices("cpu")[:4], model=2)  # dp2 x pp2
    with mesh:
        got = jax.jit(
            lambda v, im: vit_forward_pp(model, v, im, mesh, num_microbatches=2)
        )(variables, img)

    np.testing.assert_allclose(
        np.asarray(got["last_feat"]), np.asarray(want["last_feat"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["point_tokens"]), np.asarray(want["point_tokens"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["attns"]), np.asarray(want["attns"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["org_feats"]), np.asarray(want["org_feats"]), atol=2e-5)
    for fg, fw in zip(got["feature"], want["feature"]):
        np.testing.assert_allclose(np.asarray(fg), np.asarray(fw), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["outputs_coord"]), np.asarray(want["outputs_coord"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got["outputs_class"]), np.asarray(want["outputs_class"]), atol=2e-4)
