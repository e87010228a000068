"""EMA teacher (momentum teacher-student training variant).

Rebuilds ``FasterRCNNPointSupAlignTS`` + ``EpochBasedRunnerAmpTS``
(`mmdet/models/detectors/faster_rcnn_pointSup_align_teacher_student.py:
36-90`, `mmcv_custom/runner/epoch_based_runner_ts.py:96-180`): a
momentum copy of the parameters is updated every iteration and its
backbone outputs drive the pseudo-label engine while the student learns.

Functionally: teacher params are just another pytree; ``ema_update``
after each optimizer step, and ``make_train_step_ts`` wires the teacher
forward into the detector's ``teacher`` input.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from .state import TrainState

__all__ = ["ema_update", "make_train_step_ts"]


def ema_update(teacher: Any, student: Any, momentum: float = 0.999) -> Any:
    """teacher <- m * teacher + (1 - m) * student (per-iter momentum)."""
    return jax.tree.map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher, student,
    )


def make_train_step_ts(model, momentum: float = 0.999) -> Callable:
    """Teacher-student train step: (state, teacher_params, batch, rng) ->
    (state, teacher_params, metrics). The teacher's backbone outputs feed
    the pseudo-label engine (detector ``teacher=`` input)."""

    def train_step(state: TrainState, teacher_params, batch, rng, loss_enable=1.0):
        k_samp, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        teacher_out = model.apply(
            teacher_params, batch["img"],
            method=type(model).backbone_forward,
        )

        def loss_fn(params):
            losses, aux = model.apply(
                params,
                batch["img"], batch["gt_points"], batch["gt_labels"],
                batch["gt_valid"], batch["img_wh"],
                loss_enable=loss_enable,
                teacher=teacher_out,
                rngs={"sampling": k_samp, "dropout": k_drop},
            )
            total = sum(v for k, v in losses.items() if k.startswith("loss"))
            return total, losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        new_teacher = ema_update(teacher_params, new_state.params, momentum)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, new_teacher, metrics

    return jax.jit(train_step, donate_argnums=(0, 1))
