"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Run as: python tests/_dist_worker.py <process_id> <num_processes> <port> <tmpdir>

Exercises the real multi-host stack the TPU pod path uses
(`tools/train.py:26-27`): ``jax.distributed.initialize`` with a
coordinator, a global mesh spanning both processes' devices,
``make_array_from_process_local_data`` batch assembly, a cross-process
collective (global mean), the loader's per-host strided sharding, the
``collect_results_fs`` eval gather (`eval/runner.py`), and — VERDICT
round-3 item 6 — ONE REAL TRAIN STEP of the tiny-config flagship model
on the global mesh, whose metrics the parent test checks against a
single-process run of the identical step (the DDP-all-reduce
correctness check, `mmdet/apis/train.py:96-99` analog).

``tiny_train_step_metrics`` is imported by the parent test to compute
the single-process reference on the same 4-device mesh shape.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_train_step_metrics(devices, seed: int = 0):
    """One deterministic train step of the tiny flagship on a pure-DP
    mesh over ``devices``; returns {name: float} metrics.

    Everything is derived from constants + PRNGKey(seed), so any two
    runs over the same GLOBAL mesh shape — whether the devices live in
    one process or several — must agree up to reduction order.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from attentionshift_tpu.models.detector import AttnShiftDetector
    from attentionshift_tpu.parallel.mesh import make_mesh, place_state, shard_batch
    from attentionshift_tpu.train.optim import build_optimizer
    from attentionshift_tpu.train.state import TrainState
    from attentionshift_tpu.train.step import make_train_step

    model = AttnShiftDetector(
        num_classes=20, embed_dim=96, depth=4, num_heads=2,
        out_indices=(0, 1, 2, 3), img_size=64, point_tokens=20, cam_layer=3,
        use_remat=False, max_gt=4, ccl_iters=8, num_mask_point_gt=4,
        corr_size=5, mean_shift_times=2, num_semantic_points=2,
        rpn_channels=32, num_proposals=32, rpn_nms_pre=32, rcnn_samples=16,
        mask_sample_cap=4,
    )
    b, h, w = len(devices), 64, 64
    rs = np.random.RandomState(7)
    batch = {
        "img": rs.randn(b, h, w, 3).astype(np.float32),
        "gt_points": np.tile(
            np.asarray([[[20.0, 20.0], [40.0, 44.0], [0, 0], [0, 0]]],
                       np.float32), (b, 1, 1)),
        "gt_labels": np.tile(np.asarray([[1, 3, 0, 0]], np.int32), (b, 1)),
        "gt_valid": np.tile(np.asarray([[True, True, False, False]]), (b, 1)),
        "img_wh": np.tile(np.asarray([[float(w), float(h)]], np.float32), (b, 1)),
    }
    rng = jax.random.PRNGKey(seed)
    params = jax.jit(
        lambda r: model.init(
            {"params": r, "sampling": r, "dropout": r},
            jnp.asarray(batch["img"][:1]), jnp.asarray(batch["gt_points"][:1]),
            jnp.asarray(batch["gt_labels"][:1]), jnp.asarray(batch["gt_valid"][:1]),
            jnp.asarray(batch["img_wh"][:1]),
        )
    )(rng)
    jax.block_until_ready(params)
    tx = build_optimizer(params, steps_per_epoch=10, accumulate_steps=2, depth=4)
    state = TrainState.create(params, tx)

    mesh = make_mesh(devices=devices)
    with mesh:
        state = place_state(state, mesh)
        if jax.process_count() > 1:
            # multi-host batch assembly (`tools/train.py` pod path): each
            # process contributes the rows its addressable devices own
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(("data",)))
            per = b // jax.process_count()
            lo = jax.process_index() * per
            sharded = {
                k: jax.make_array_from_process_local_data(
                    sh, v[lo:lo + per], global_shape=v.shape)
                for k, v in batch.items()
            }
        else:
            sharded = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        train_step = make_train_step(model, donate=False)
        new_state, metrics = train_step(state, sharded, rng)
        jax.block_until_ready(metrics)
    assert int(new_state.step) == 1
    return {k: float(v) for k, v in metrics.items()}


def main() -> None:
    pid, nproc, port, tmpdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=3600 "
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    )

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 2 * nproc, devs  # 2 local CPU devices per process
    mesh = Mesh(np.asarray(devs).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))

    # global batch of 8 rows, each process contributes its local 4
    local = np.arange(pid * 4, pid * 4 + 4, dtype=np.float32)[:, None] * np.ones(
        (1, 3), np.float32
    )
    garr = jax.make_array_from_process_local_data(
        sharding, local, global_shape=(8, 3))
    mean = jax.jit(lambda x: x.mean(), out_shardings=NamedSharding(mesh, P()))(garr)
    got = float(np.asarray(mean))
    assert abs(got - 3.5) < 1e-6, got  # mean of 0..7 — cross-process psum worked

    # loader: per-host strided shard must be deterministic and disjoint
    from attentionshift_tpu.data.loader import TrainLoader

    loader = TrainLoader(
        dataset=list(range(11)), pipeline=None, batch_size=2, seed=3,
        process_index=pid, process_count=nproc,
    )
    my_shard = [int(i) for i in loader._epoch_indices(epoch=0)]

    # eval gather: each process publishes its shard; rank 0 merges
    from attentionshift_tpu.eval.runner import collect_results_fs

    merged = collect_results_fs(tmpdir, pid, nproc, {"pid": pid, "shard": my_shard})
    if pid == 0:
        assert merged is not None and len(merged) == nproc
        all_idx = sorted(sum((p["shard"] for p in merged), []))
        assert all_idx == list(range(11)), all_idx  # disjoint cover

    # THE REAL MODEL across processes: one train step of the tiny
    # flagship on the global 4-device mesh; rank 0 publishes the metrics
    # for the parent's single-process comparison
    metrics = tiny_train_step_metrics(devs)
    for k, v in metrics.items():
        assert np.isfinite(v), f"{k} not finite in distributed step"
    if pid == 0:
        with open(os.path.join(tmpdir, "dist_train_metrics.json"), "w") as f:
            json.dump(metrics, f)

    print(f"WORKER {pid} OK")


if __name__ == "__main__":
    main()
