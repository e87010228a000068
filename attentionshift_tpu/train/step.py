"""The pjit-able data-parallel train/eval steps.

Replaces `EpochBasedRunnerAmp.train` + `DistOptimizerHook`
(`mmcv_custom/runner/epoch_based_runner.py`, `mmdet/utils/optimizer.py`):
one jitted function computes losses, averages gradients across the
``data`` mesh axis (implicitly — parameters are replicated, the loss
averages over the sharded batch, XLA inserts the psum), and applies the
accumulating optimizer.

Batch contract (all arrays leading-dim = global batch):
    img (B, H, W, 3) f32/bf16, gt_points (B, G, 2), gt_labels (B, G),
    gt_valid (B, G), img_wh (B, 2).
"""

from __future__ import annotations

from typing import Callable

import jax

from .state import TrainState

__all__ = ["make_train_step", "make_refine_train_step", "make_eval_step"]


def make_train_step(model, donate: bool = True) -> Callable:
    """Build the jitted train step for an ``AttnShiftDetector``-like model.

    The returned fn: (state, batch, rng, loss_enable) -> (state, metrics).
    """

    def train_step(state: TrainState, batch: dict, rng: jax.Array, loss_enable=1.0):
        k_samp, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            losses, aux = model.apply(
                params,
                batch["img"],
                batch["gt_points"],
                batch["gt_labels"],
                batch["gt_valid"],
                batch["img_wh"],
                loss_enable=loss_enable,
                rngs={"sampling": k_samp, "dropout": k_drop},
            )
            total = sum(v for k, v in losses.items() if k.startswith("loss"))
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_refine_train_step(model, donate: bool = True) -> Callable:
    """Train step for the Mask R-CNN refinement stage (full pseudo
    annotations: boxes + labels + masks instead of points)."""

    def train_step(state: TrainState, batch: dict, rng: jax.Array, loss_enable=1.0):
        k_samp = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            losses, _ = model.apply(
                params,
                batch["img"],
                batch["gt_boxes"],
                batch["gt_labels"],
                batch["gt_masks"],
                batch["gt_valid"],
                batch["img_wh"],
                loss_enable=loss_enable,
                rngs={"sampling": k_samp},
            )
            total = sum(v for k, v in losses.items() if k.startswith("loss"))
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    """Jitted single-scale inference step: (params, img, img_wh) -> TestOutputs."""

    def eval_step(params, img, img_wh):
        return model.apply(params, img, img_wh, method=type(model).simple_test)

    return jax.jit(eval_step)
