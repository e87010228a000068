#!/usr/bin/env python
"""Training CLI (the `tools/train.py` counterpart).

Usage:
    python tools/train.py configs/attnshift_voc12aug.py \
        --work-dir work_dirs/voc --cfg-options optimizer.base_lr=5e-5

Builds the VOC point dataset + loader, the AttnShiftDetector, the
layer-decay AdamW, a (data, model) mesh over all local devices, then runs
the epoch loop with per-epoch orbax checkpoints, auto-resume, epoch-gated
loss weights, and optional per-epoch eval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PROCESS_COUNT"):  # multi-host pod: every host runs this
    # TPU pods / SLURM: no-arg initialize() auto-discovers the topology.
    # Explicit rendezvous (tools/dist_train.sh off-SLURM): JAX_COORDINATOR
    # =host:port with JAX_PROCESS_ID per process.
    if os.environ.get("JAX_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR"],
            num_processes=int(os.environ["JAX_PROCESS_COUNT"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("ATTNSHIFT_PLATFORM") == "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default="work_dirs/attnshift")
    p.add_argument("--resume-from", default=None)
    p.add_argument("--no-auto-resume", action="store_true")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--validate-limit", type=int, default=None,
                   help="eval only the first N val images each epoch")
    p.add_argument("--max-steps", type=int, default=None,
                   help="debug: stop after N optimizer steps")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def build_model(cfg):
    if cfg.get("model_type", "attnshift") == "mask_rcnn":
        from attentionshift_tpu.models.mask_rcnn import MaskRCNN

        return MaskRCNN(**cfg.model.to_dict())
    from attentionshift_tpu.models.detector import AttnShiftDetector

    return AttnShiftDetector(**cfg.model.to_dict())


def main():
    args = parse_args()
    from attentionshift_tpu.config import Config
    from attentionshift_tpu.data.build import build_train_dataset
    from attentionshift_tpu.data.loader import TrainLoader
    from attentionshift_tpu.data.pipeline import TrainPipeline
    from attentionshift_tpu.models.convert import load_torch_state_dict, mae_to_vit_params
    from attentionshift_tpu.parallel.mesh import (
        mesh_from_config, place_state, shard_batch,
    )
    from attentionshift_tpu.train import (
        TrainState,
        build_optimizer,
        latest_checkpoint,
        make_train_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from attentionshift_tpu.utils import MetricLogger, check_finite_losses

    cfg = Config.fromfile(args.config).merge_from_options(args.cfg_options)
    # parallel config block (TPU extension; the reference is DP-only,
    # `run_train.py:9`): mesh axes + sequence parallelism. SP is a model
    # construction flag, so inject it before build_model.
    pcfg = dict(cfg.get("parallel", {}))
    if pcfg.get("sequence_parallel"):
        cfg["model"] = {**dict(cfg["model"]), "sequence_parallel": True}
    os.makedirs(args.work_dir, exist_ok=True)
    # collect_env analog (`tools/train.py:140-144` in the reference)
    import flax, optax, orbax.checkpoint

    print(f"env: jax {jax.__version__}, flax {flax.__version__}, "
          f"optax {optax.__version__}, devices {jax.devices()}, "
          f"process {jax.process_index()}/{jax.process_count()}")
    with open(os.path.join(args.work_dir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, default=str)

    seed = int(cfg.runtime.seed)
    refine = cfg.get("model_type", "attnshift") == "mask_rcnn"
    dataset = build_train_dataset(cfg.data.train.to_dict())
    if refine:
        from attentionshift_tpu.data.refine import RefineTrainPipeline

        pipeline = RefineTrainPipeline(
            scales=[tuple(s) for s in cfg.data.train_scales],
            max_gt=int(cfg.data.max_gt),
            flip_ratio=float(cfg.data.flip_ratio),
            mask_stride=int(cfg.model.get("mask_stride", 4)),
        )
    else:
        crop = cfg.data.get("crop_size", None)
        pipeline = TrainPipeline(
            scales=[tuple(s) for s in cfg.data.train_scales],
            max_gt=int(cfg.data.max_gt),
            flip_ratio=float(cfg.data.flip_ratio),
            crop_size=tuple(crop) if crop else None,
            brightness_delta=float(cfg.data.get("brightness_delta", 0.0)),
        )
    loader = TrainLoader(
        dataset, pipeline, batch_size=int(cfg.data.batch_size), seed=seed,
        num_threads=int(cfg.data.num_threads),
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    steps_per_epoch = loader.steps_per_epoch()
    print(f"dataset: {len(dataset)} samples, {steps_per_epoch} steps/epoch")

    # NumClassCheckHook analog: dataset labels must fit the head
    max_label = max((int(s.labels.max()) for s in dataset.samples if len(s.labels)),
                    default=-1)
    if max_label >= int(cfg.model.num_classes):
        raise ValueError(
            f"dataset contains label {max_label} but model.num_classes="
            f"{cfg.model.num_classes} (NumClassCheckHook)")

    model = build_model(cfg)
    rng = jax.random.PRNGKey(seed)
    # init with one dummy bucket-shaped batch
    bh, bw = pipeline.bucket_hw
    g = int(cfg.data.max_gt)
    if refine:
        ms = int(cfg.model.get("mask_stride", 4))
        params = model.init(
            {"params": rng, "sampling": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 4), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g, bh // ms, bw // ms), jnp.uint8),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )
    else:
        params = model.init(
            {"params": rng, "sampling": rng, "dropout": rng},
            jnp.zeros((1, bh, bw, 3), jnp.float32),
            jnp.zeros((1, g, 2), jnp.float32),
            jnp.zeros((1, g), jnp.int32),
            jnp.zeros((1, g), bool),
            jnp.asarray([[float(bw), float(bh)]], jnp.float32),
        )

    if cfg.get("pretrained") and not refine:
        sd = load_torch_state_dict(cfg.pretrained)
        bb = mae_to_vit_params(
            sd, params["params"]["backbone"], depth=int(cfg.model.depth)
        )
        params = {**params, "params": {**params["params"], "backbone": bb}}
        print(f"loaded MAE pretrain: {cfg.pretrained}")
    elif cfg.get("pretrained") and refine:
        from attentionshift_tpu.models.convert import torchvision_resnet_params

        sd = load_torch_state_dict(cfg.pretrained)
        bb = torchvision_resnet_params(sd, params["params"]["backbone"])
        params = {**params, "params": {**params["params"], "backbone": bb}}
        print(f"loaded ResNet pretrain: {cfg.pretrained}")

    if refine:
        from attentionshift_tpu.train.optim import build_sgd_optimizer

        tx = build_sgd_optimizer(
            params,
            base_lr=float(cfg.optimizer.base_lr),
            momentum=float(cfg.optimizer.get("momentum", 0.9)),
            weight_decay=float(cfg.optimizer.weight_decay),
            steps_per_epoch=steps_per_epoch,
            decay_epochs=tuple(cfg.schedule.decay_epochs),
            warmup_iters=int(cfg.schedule.warmup_iters),
            warmup_ratio=float(cfg.schedule.warmup_ratio),
            accumulate_steps=int(cfg.optimizer.accumulate_steps),
            grad_clip=cfg.optimizer.get("grad_clip"),
            frozen_stages=int(cfg.model.get("frozen_stages", 1)),
            skip_nonfinite=cfg.optimizer.get("skip_nonfinite", 100),
        )
    else:
        tx = build_optimizer(
            params,
            base_lr=float(cfg.optimizer.base_lr),
            weight_decay=float(cfg.optimizer.weight_decay),
            layer_decay=float(cfg.optimizer.layer_decay),
            depth=int(cfg.model.depth),
            steps_per_epoch=steps_per_epoch,
            decay_epochs=tuple(cfg.schedule.decay_epochs),
            warmup_iters=int(cfg.schedule.warmup_iters),
            warmup_ratio=float(cfg.schedule.warmup_ratio),
            accumulate_steps=int(cfg.optimizer.accumulate_steps),
            grad_clip=cfg.optimizer.get("grad_clip"),
            skip_nonfinite=cfg.optimizer.get("skip_nonfinite", 100),
        )
    state = TrainState.create(params, tx)

    resume = args.resume_from
    if resume is None and not args.no_auto_resume:
        resume = latest_checkpoint(args.work_dir)
    if resume:
        state = restore_checkpoint(resume, state)
        print(f"resumed from {resume} (epoch {int(state.epoch)})")

    mesh_devices = (
        jax.devices("cpu") if os.environ.get("ATTNSHIFT_PLATFORM") == "cpu" else None
    )
    mesh = mesh_from_config(pcfg, mesh_devices,
                            batch_size=int(cfg.data.batch_size))
    if int(mesh.shape.get("model", 1)) > 1 or pcfg.get("sequence_parallel"):
        print(f"parallel: mesh {dict(mesh.shape)}, "
              f"sp={bool(pcfg.get('sequence_parallel', False))}")
    use_teacher = bool(cfg.get("teacher", {}).get("enabled", False))
    if use_teacher:
        from attentionshift_tpu.train.ema import make_train_step_ts

        teacher_params = jax.tree.map(jnp.copy, state.params)
        train_step_ts = make_train_step_ts(
            model, momentum=float(cfg.teacher.get("momentum", 0.999))
        )
    if refine:
        from attentionshift_tpu.train.step import make_refine_train_step

        train_step = make_refine_train_step(model)
    else:
        train_step = make_train_step(model)
    start_epoch = int(state.epoch)
    total_epochs = int(cfg.schedule.total_epochs)
    loss_start = int(cfg.runtime.loss_weight_start_epoch)
    step_rng = jax.random.PRNGKey(seed + 1)
    done_steps = 0
    mlog = MetricLogger(os.path.join(args.work_dir, "train_log.jsonl"))

    with mesh:
        state = place_state(state, mesh)
        for epoch in range(start_epoch, total_epochs):
            t_ep = time.time()
            for i, batch in enumerate(loader.epoch(epoch)):
                enable = 1.0 if epoch >= loss_start else 0.0
                batch = shard_batch(
                    {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}, mesh
                )
                if use_teacher:
                    state, teacher_params, metrics = train_step_ts(
                        state, teacher_params, batch, step_rng, enable)
                else:
                    state, metrics = train_step(state, batch, step_rng, enable)
                done_steps += 1
                if i % int(cfg.runtime.log_interval) == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    check_finite_losses(metrics, step=done_steps)
                    mlog.update(metrics)
                    print(mlog.line(epoch, i, steps_per_epoch), flush=True)
                if args.max_steps and done_steps >= args.max_steps:
                    break
            state = state.next_epoch()
            if jax.process_index() == 0 and (epoch + 1) % int(cfg.runtime.checkpoint_interval) == 0:
                path = save_checkpoint(args.work_dir, state)
                print(f"saved {path} ({time.time() - t_ep:.1f}s/epoch)")
            # EvalHook analog: run the val metric every eval_interval epochs
            if (
                not args.no_validate
                and jax.process_index() == 0
                and cfg.data.get("val")
                and (epoch + 1) % int(cfg.runtime.get("eval_interval", 1)) == 0
            ):
                from attentionshift_tpu.data.build import build_eval_dataset
                from attentionshift_tpu.eval.runner import evaluate

                val_ds = build_eval_dataset(cfg.data.val.to_dict())
                metrics_val = evaluate(
                    model, state.params, val_ds,
                    test_scale=tuple(cfg.data.test_scale),
                    limit=args.validate_limit,
                    num_classes=int(cfg.model.num_classes), verbose=False,
                )
                print(f"epoch {epoch} val: "
                      f"{ {k: round(v, 4) for k, v in metrics_val.items()} }",
                      flush=True)
            if args.max_steps and done_steps >= args.max_steps:
                break

    print("training done")


if __name__ == "__main__":
    main()
