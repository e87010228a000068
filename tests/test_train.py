"""Tests for optimizer (layer decay), schedule, TrainState, DP train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

# compile-heavy tests carry individual slow marks; the optimizer/schedule
# unit tests stay in the quick tier

from attentionshift_tpu.models.detector import AttnShiftDetector
from attentionshift_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from attentionshift_tpu.train.optim import (
    build_optimizer,
    lr_scale_tree,
    step_lr_schedule,
    vit_layer_id,
    weight_decay_mask,
)
from attentionshift_tpu.train.state import TrainState
from attentionshift_tpu.train.step import make_train_step


def test_vit_layer_id_rules():
    n = 14  # depth 12 + 2
    assert vit_layer_id(("backbone", "cls_token"), n) == 0
    assert vit_layer_id(("backbone", "pos_embed"), n) == 0
    assert vit_layer_id(("backbone", "patch_embed", "proj", "kernel"), n) == 0
    assert vit_layer_id(("backbone", "blocks_0", "attn", "qkv", "kernel"), n) == 1
    assert vit_layer_id(("backbone", "blocks_11", "mlp", "fc1", "bias"), n) == 12
    assert vit_layer_id(("backbone", "point_token"), n) == 13  # not special-cased
    assert vit_layer_id(("bbox_head", "fc_cls", "kernel"), n) == 13
    assert vit_layer_id(("neck", "lateral_0", "kernel"), n) == 13


def test_lr_scale_and_wd_mask():
    params = {
        "backbone": {
            "cls_token": jnp.zeros((1, 1, 8)),
            "pos_embed": jnp.zeros((1, 5, 8)),
            "blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros((24,))}}},
            "blocks_11": {"mlp": {"fc1": {"kernel": jnp.zeros((8, 32))}}},
            "point_token": jnp.zeros((1, 4, 8)),
        },
        "bbox_head": {"fc_cls": {"kernel": jnp.zeros((8, 21)), "bias": jnp.zeros((21,))}},
    }
    scales = lr_scale_tree(params, layer_decay=0.75, depth=12)
    assert np.isclose(scales["backbone"]["cls_token"], 0.75**13)
    assert np.isclose(scales["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"], 0.75**12)
    assert np.isclose(scales["backbone"]["blocks_11"]["mlp"]["fc1"]["kernel"], 0.75**1)
    assert np.isclose(scales["bbox_head"]["fc_cls"]["kernel"], 1.0)

    mask = weight_decay_mask(params)
    assert mask["bbox_head"]["fc_cls"]["kernel"]
    assert not mask["bbox_head"]["fc_cls"]["bias"]
    assert not mask["backbone"]["cls_token"]  # ndim>1 but *_token
    assert not mask["backbone"]["pos_embed"]
    assert mask["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not mask["backbone"]["blocks_0"]["attn"]["qkv"]["bias"]


def test_step_lr_schedule():
    sched = step_lr_schedule(1e-4, steps_per_epoch=100, decay_epochs=(8, 11),
                             warmup_iters=50, warmup_ratio=1e-3)
    assert np.isclose(float(sched(0)), 1e-4 * 1e-3, rtol=1e-3)
    assert float(sched(25)) < 1e-4
    assert np.isclose(float(sched(50)), 1e-4)
    assert np.isclose(float(sched(799)), 1e-4)
    assert np.isclose(float(sched(800)), 1e-5)
    assert np.isclose(float(sched(1100)), 1e-6)


def test_multisteps_accumulation():
    params = {"w": jnp.ones((3,))}
    tx = build_optimizer(params, base_lr=1.0, accumulate_steps=2,
                         steps_per_epoch=10, warmup_iters=0, depth=0,
                         layer_decay=1.0, weight_decay=0.0)
    state = TrainState.create(params, tx)
    g = {"w": jnp.ones((3,))}
    s1 = state.apply_gradients(g)
    # first micro-step: no update applied yet
    np.testing.assert_allclose(np.asarray(s1.params["w"]), 1.0)
    s2 = s1.apply_gradients(g)
    assert not np.allclose(np.asarray(s2.params["w"]), 1.0)


def test_restore_params_ignores_optimizer_layout(tmp_path):
    """Eval-side tools restore params from a checkpoint regardless of
    the TRAINING optimizer layout (accumulation wrapper, non-finite
    guard) — restore_checkpoint needs a structurally identical template,
    which previously forced accumulate_steps=1 eval templates that could
    not restore accumulate_steps=2 training checkpoints."""
    from attentionshift_tpu.train import (
        restore_params, save_checkpoint,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = build_optimizer(params, accumulate_steps=2, steps_per_epoch=10,
                         warmup_iters=0, depth=0, skip_nonfinite=5)
    state = TrainState.create(params, tx)
    state = state.apply_gradients({"w": jnp.ones((2, 3))})
    path = save_checkpoint(str(tmp_path), state)
    got = restore_params(path)
    np.testing.assert_array_equal(np.asarray(got["w"]),
                                  np.asarray(state.params["w"]))


def test_apply_if_finite_fused_matches_optax():
    """The select-gated non-finite guard (train-step perf: replaces
    optax's state-copying ``lax.cond``) is update- and state-identical
    to ``optax.apply_if_finite`` across finite, rejected, and
    give-up-accept steps."""
    import optax

    from attentionshift_tpu.train.optim import apply_if_finite_fused

    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    inner = optax.adam(1e-2)
    ref = optax.apply_if_finite(inner, max_consecutive_errors=2)
    fused = apply_if_finite_fused(inner, max_consecutive_errors=2)
    sr, sf = ref.init(params), fused.init(params)

    fin = {"w": jnp.full((4,), 0.5), "b": jnp.full((2,), -0.25)}
    bad = {"w": jnp.asarray([1.0, jnp.nan, 2.0, 3.0]), "b": jnp.full((2,), 1.0)}
    # finite, 2 rejected, then the give-up accept (count > 2), finite
    for g in (fin, bad, bad, bad, bad, fin):
        ur, sr = ref.update(g, sr, params)
        uf, sf = fused.update(g, sf, params)
        # updates agree to float rounding (optax compiles the inner
        # update inside lax.cond -> fused math; ~1 ulp vs eager)
        for a, b in zip(jax.tree.leaves(ur), jax.tree.leaves(uf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       equal_nan=True, rtol=1e-5, atol=1e-8)
        assert int(sr.notfinite_count) == int(sf.notfinite_count)
        assert bool(sr.last_finite) == bool(sf.last_finite)
        assert int(sr.total_notfinite) == int(sf.total_notfinite)
        for a, b in zip(jax.tree.leaves(sr.inner_state),
                        jax.tree.leaves(sf.inner_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       equal_nan=True, atol=0)


def test_nonfinite_gradients_skip_step():
    """apex-AMP overflow-skip parity: inf/NaN grads leave the state
    untouched and training resumes on the next finite step."""
    params = {"w": jnp.ones((3,))}
    tx = build_optimizer(params, base_lr=1.0, accumulate_steps=1,
                         steps_per_epoch=10, warmup_iters=0, depth=0,
                         layer_decay=1.0, weight_decay=0.0)
    state = TrainState.create(params, tx)
    g = {"w": jnp.ones((3,))}
    s1 = state.apply_gradients(g)
    w1 = np.asarray(s1.params["w"])
    for bad in (jnp.nan, jnp.inf):
        s2 = s1.apply_gradients({"w": jnp.full((3,), bad)})
        np.testing.assert_array_equal(np.asarray(s2.params["w"]), w1)
        s3 = s2.apply_gradients(g)  # recovers
        assert np.isfinite(np.asarray(s3.params["w"])).all()
        assert not np.allclose(np.asarray(s3.params["w"]), w1)


TINY = dict(
    num_classes=4, embed_dim=48, depth=4, num_heads=6, out_indices=(0, 1, 2, 3),
    img_size=64, point_tokens=10, cam_layer=3, use_remat=False, max_gt=2,
    cam_stride=4, ccl_iters=8, num_mask_point_gt=4, corr_size=3,
    mean_shift_times=2, num_semantic_points=2, rpn_channels=16,
    num_proposals=16, rpn_nms_pre=16, rcnn_samples=8, mask_sample_cap=4,
)


@pytest.mark.slow
def test_data_parallel_train_step_8dev():
    """One DP train step on the virtual 8-device mesh."""
    ndev = len(jax.devices("cpu"))
    assert ndev >= 8
    mesh = make_mesh(jax.devices("cpu")[:8])
    model = AttnShiftDetector(**TINY)
    B, H, W, G = 8, 64, 64, 2
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), jnp.float32),
        "gt_points": jnp.tile(jnp.asarray([[[20.0, 20.0], [40.0, 44.0]]]), (B, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (B, 1)),
        "gt_valid": jnp.tile(jnp.asarray([[True, True]]), (B, 1)),
        "img_wh": jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1)),
    }
    params = model.init(
        {"params": rng, "sampling": rng, "dropout": rng},
        batch["img"][:1], batch["gt_points"][:1], batch["gt_labels"][:1],
        batch["gt_valid"][:1], batch["img_wh"][:1],
    )
    tx = build_optimizer(params, steps_per_epoch=10, accumulate_steps=1, depth=4)
    state = TrainState.create(params, tx)

    with mesh:
        state = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        train_step = make_train_step(model, donate=False)
        new_state, metrics = train_step(state, sharded, rng)

    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # parameters stay replicated & consistent across devices
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_train_step_with_reppoints_cascade_and_mae_head():
    """RepPoints cascade (`stdroi:2663-2717`) + MAE aux head
    (`stdroi:2731-2733`) wired through the full train step: cascade loss
    keys (suffixed per stage), finite losses, and gradients reach both
    heads' parameters."""
    model = AttnShiftDetector(
        **TINY, with_reppoints_head=True, num_reppoints_head=2,
        with_deform_sup=True, reppoints_num_points=5,
        reppoints_contour_points=8, with_mae_head=True,
    )
    B, H, W = 2, 64, 64
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), jnp.float32),
        "gt_points": jnp.tile(jnp.asarray([[[20.0, 20.0], [40.0, 44.0]]]), (B, 1, 1)),
        "gt_labels": jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (B, 1)),
        "gt_valid": jnp.tile(jnp.asarray([[True, True]]), (B, 1)),
        "img_wh": jnp.tile(jnp.asarray([[64.0, 64.0]]), (B, 1)),
    }
    params = model.init(
        {"params": rng, "sampling": rng, "dropout": rng},
        batch["img"][:1], batch["gt_points"][:1], batch["gt_labels"][:1],
        batch["gt_valid"][:1], batch["img_wh"][:1],
    )
    # both heads' params exist
    assert "reppoints_head_0" in params["params"]
    assert "reppoints_head_1" in params["params"]
    assert "mae_head" in params["params"]

    tx = build_optimizer(params, steps_per_epoch=10, accumulate_steps=1, depth=4)
    state = TrainState.create(params, tx)
    train_step = make_train_step(model, donate=False)
    new_state, metrics = train_step(state, batch, rng)

    # stage-0 keys unsuffixed, stage-1 keys suffixed `_0` (reference
    # `reppoint_loss_2[k + f'_{i}']`, `stdroi:2681-2684`)
    for k in ("loss_rp_border", "loss_rp_chamfer_sem", "loss_rp_chamfer_contour",
              "loss_rp_cls", "loss_rp_border_0", "loss_rp_cls_0", "loss_mae_rec"):
        assert k in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[k])), k
    # optimizer touched the aux heads' params
    for head in ("reppoints_head_0", "mae_head"):
        before = jax.tree.leaves(params["params"][head])
        after = jax.tree.leaves(new_state.params["params"][head])
        delta = sum(float(np.abs(np.asarray(a) - np.asarray(b)).sum())
                    for a, b in zip(after, before))
        assert delta > 0, f"no update reached {head}"


def test_checkpoint_roundtrip(tmp_path):
    from attentionshift_tpu.train.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint,
    )

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    tx = build_optimizer(params, steps_per_epoch=10, accumulate_steps=1, depth=0)
    state = TrainState.create(params, tx)
    state = state.apply_gradients({"w": jnp.ones((2, 3)), "b": jnp.ones((3,))})
    state = state.next_epoch()

    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == path

    # save another epoch; latest should move
    state2 = state.next_epoch()
    path2 = save_checkpoint(str(tmp_path), state2)
    assert latest_checkpoint(str(tmp_path)) == path2

    fresh = TrainState.create(params, tx)
    restored = restore_checkpoint(path2, fresh)
    assert int(restored.step) == 1 and int(restored.epoch) == 2
    np.testing.assert_allclose(
        np.asarray(restored.params["w"]), np.asarray(state.params["w"])
    )
    opt_a = jax.tree.leaves(restored.opt_state)
    opt_b = jax.tree.leaves(state2.opt_state)
    for a, b in zip(opt_a, opt_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_tensor_parallel_matches_single_device():
    """TP-sharded ViT forward (Megatron specs via parallel.tp) equals the
    replicated single-device result."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from attentionshift_tpu.models.vit import VisionTransformerDet
    from attentionshift_tpu.parallel.tp import shard_params_tp, tp_spec_tree

    model = VisionTransformerDet(
        embed_dim=96, depth=4, num_heads=6, img_size=64,
        out_indices=(0, 1, 2, 3), point_tokens_num=8, capture_layers=1,
        use_remat=False,
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    params = model.init(rng, img)

    ref = model.apply(params, img)

    mesh = make_mesh(jax.devices("cpu")[:4], model=2)  # dp2 x tp2
    specs = tp_spec_tree(params, mesh)
    # the rules actually hit the transformer kernels
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded_paths = [
        "/".join(str(k.key) for k in kp if hasattr(k, "key"))
        for kp, s in flat if s != P()
    ]
    assert any("qkv/kernel" in p for p in sharded_paths)
    assert any("fc2/kernel" in p for p in sharded_paths)

    with mesh:
        p_tp = shard_params_tp(params, mesh)
        img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda p, x: model.apply(p, x))(p_tp, img_sh)

    for k in ("point_tokens", "outputs_class", "last_feat"):
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32),
            rtol=2e-4, atol=2e-5,
        )


@pytest.mark.slow
def test_pallas_attention_tp_sharded_matches_plain():
    """The fused attention kernels compose with TP: under a dp2 x tp2
    mesh the shard_map'd kernel (heads on ``model``, psum'd capture mean)
    equals the unsharded jnp reference, forward and backward."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from attentionshift_tpu.ops.attention import (
        attention_no_capture_sharded,
        attention_with_capture,
        attention_with_capture_sharded,
    )

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 6, 40, 16), jnp.float32)
    k = jnp.asarray(rng.randn(2, 6, 40, 16), jnp.float32)
    v = jnp.asarray(rng.randn(2, 6, 40, 16), jnp.float32)
    ref_out, ref_mean = attention_with_capture(q, k, v, False)
    ref_gq = jax.grad(lambda q: attention_with_capture(q, k, v, False)[0].sum())(q)

    mesh = make_mesh(jax.devices("cpu")[:4], model=2)  # dp2 x tp2
    with mesh:
        sh = NamedSharding(mesh, P("data", "model"))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        out, mean = jax.jit(
            lambda q, k, v: attention_with_capture_sharded(q, k, v, True)
        )(qs, ks, vs)
        out_nc = jax.jit(
            lambda q, k, v: attention_no_capture_sharded(q, k, v, True)
        )(qs, ks, vs)
        gq = jax.jit(jax.grad(
            lambda q: attention_with_capture_sharded(q, ks, vs, True)[0].sum()
        ))(qs)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_nc), np.asarray(ref_out), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(ref_gq), rtol=2e-4, atol=2e-5)


def test_tp_indivisible_dims_fall_back_to_replication():
    from jax.sharding import PartitionSpec as P

    from attentionshift_tpu.parallel.tp import _spec_for

    assert _spec_for(("blocks_0", "attn", "qkv", "kernel"), (96, 288), 2) == P(None, "model")
    # 287 not divisible by 2 -> replicate instead of failing placement
    assert _spec_for(("blocks_0", "attn", "qkv", "kernel"), (96, 287), 2) == P()
    # patch embed conv is also named "proj" (timm) but must stay replicated
    assert _spec_for(("patch_embed", "proj", "kernel"), (16, 16, 3, 96), 2) == P()


@pytest.mark.slow
def test_sequence_parallel_matches_single_device():
    """sequence_parallel=True shards the token axis between blocks; the
    result equals the unsharded forward."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from attentionshift_tpu.models.vit import VisionTransformerDet

    kw = dict(
        embed_dim=96, depth=4, num_heads=6, img_size=64,
        out_indices=(0, 1, 2, 3), point_tokens_num=8, capture_layers=1,
        use_remat=False,
    )
    base = VisionTransformerDet(**kw)
    sp = VisionTransformerDet(**kw, sequence_parallel=True)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    params = base.init(rng, img)
    ref = base.apply(params, img)

    mesh = make_mesh(jax.devices("cpu")[:4], model=2)
    with mesh:
        p = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), params
        )
        img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))
        out = jax.jit(lambda pp, x: sp.apply(pp, x))(p, img_sh)
    for k in ("point_tokens", "last_feat"):
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32),
            rtol=2e-4, atol=2e-5,
        )


def test_mesh_from_config_batch_cap():
    """Default data-axis extent must divide the global batch: a batch-1
    CLI smoke on an 8-device host must not build a data=8 mesh it cannot
    feed (regression: tools/train.py shard_batch ValueError)."""
    from attentionshift_tpu.parallel.mesh import mesh_from_config

    devs = jax.devices("cpu")[:8]
    assert dict(mesh_from_config(None, devs, batch_size=1).shape)["data"] == 1
    assert dict(mesh_from_config(None, devs, batch_size=4).shape)["data"] == 4
    # batch 6 on 8 devices: largest divisor of 6 that fits is 6
    assert dict(mesh_from_config(None, devs, batch_size=6).shape)["data"] == 6
    # explicit config wins over the cap
    m = mesh_from_config({"data": 2}, devs, batch_size=8)
    assert dict(m.shape)["data"] == 2
    # no batch hint: all devices (the pre-existing behaviour)
    assert dict(mesh_from_config(None, devs).shape)["data"] == 8
