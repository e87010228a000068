"""Optimizer: AdamW with per-ViT-block layer decay + grad accumulation.

Rebuilds the reference training recipe
(`configs/mae/attnshift_voc12aug.py:252-266`,
`mmcv_custom/layer_decay_optimizer_constructor.py:30-98`,
`mmdet/utils/optimizer.py:10-38`):

- AdamW lr 1e-4, wd 0.05;
- per-parameter lr scale ``decay^(num_layers - layer_id - 1)`` with
  num_layers = depth + 2; layer_id 0 for patch-embed/cls-token/pos-embed,
  i+1 for block i, num_layers-1 for everything else;
- no weight decay for 1-D params, biases, ``*_token``, ``*pos_embed``;
- gradient accumulation (update_interval=2) via ``optax.MultiSteps``
  (grad averaging == the reference's loss/interval scaling);
- step LR [8, 11] x0.1 with 500-iter linear warmup from ratio 1e-3
  (`configs/_base_/schedules/schedule_1x.py`).

The reference runs apex-amp O1 fp16 with loss scaling; on TPU we train
in bf16 activations / f32 params, which needs no loss scaler.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "apply_if_finite_fused",
    "vit_layer_id",
    "lr_scale_tree",
    "weight_decay_mask",
    "step_lr_schedule",
    "build_optimizer",
    "build_sgd_optimizer",
]


def vit_layer_id(path: tuple[str, ...], num_layers: int) -> int:
    """Layer id of a param path (``get_num_layer_for_vit`` semantics).

    ``path`` is the flattened pytree key path, e.g.
    ('backbone', 'blocks_3', 'attn', 'qkv', 'kernel').
    """
    if not path or path[0] != "backbone":
        return num_layers - 1
    if len(path) >= 2:
        name = path[1]
        if name in ("cls_token", "pos_embed") or name.startswith("patch_embed"):
            return 0
        if name.startswith("blocks_"):
            return int(name.split("_")[-1]) + 1
    return num_layers - 1


def _key_path(kp) -> tuple[str, ...]:
    out = []
    for k in kp:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        else:
            out.append(str(k))
    return tuple(out)


def lr_scale_tree(params: Any, layer_decay: float, depth: int) -> Any:
    """Per-leaf lr multiplier pytree."""
    num_layers = depth + 2

    def scale(kp, _):
        lid = vit_layer_id(_key_path(kp), num_layers)
        return layer_decay ** (num_layers - lid - 1)

    return jax.tree_util.tree_map_with_path(scale, params)


def weight_decay_mask(params: Any, frozen_stages: int = -1) -> Any:
    """True where weight decay applies (mmcv no-decay rules).

    ``frozen_stages``: additionally exclude the ResNet stem/early-stage
    params that ``models.resnet.ResNet`` freezes via ``stop_gradient`` —
    their gradients are zero but decoupled decay would still shrink the
    pretrained weights every step (torch ``requires_grad=False`` params
    receive neither grads nor decay).
    """

    def frozen(path: tuple[str, ...]) -> bool:
        if frozen_stages < 0 or "backbone" not in path:
            return False
        i = path.index("backbone")
        rest = path[i + 1 :]
        if not rest:
            return False
        head = rest[0]
        if frozen_stages >= 0 and head in ("conv1", "bn1"):
            return True
        if head.startswith("layer"):
            try:
                stage = int(head.replace("layer", "").split("_")[0])
            except ValueError:
                return False
            return stage <= frozen_stages
        return False

    def use_wd(kp, p):
        path = _key_path(kp)
        name = path[-1] if path else ""
        full = ".".join(path)
        if p.ndim <= 1 or name == "bias":
            return False
        if full.endswith("_token") or "pos_embed" in full:
            return False
        if frozen(path):
            return False
        return True

    return jax.tree_util.tree_map_with_path(use_wd, params)


def step_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs: Sequence[int] = (8, 11),
    gamma: float = 0.1,
    warmup_iters: int = 500,
    warmup_ratio: float = 1e-3,
) -> optax.Schedule:
    """mmcv step policy with linear warmup."""
    boundaries = {int(e * steps_per_epoch): gamma for e in decay_epochs}

    def sched(step):
        lr = optax.piecewise_constant_schedule(base_lr, boundaries)(step)
        warm = base_lr * (
            warmup_ratio + (1.0 - warmup_ratio) * jnp.minimum(step, warmup_iters) / warmup_iters
        )
        return jnp.where(step < warmup_iters, warm, lr)

    return sched


def apply_if_finite_fused(
    inner: optax.GradientTransformation, max_consecutive_errors: int
) -> optax.GradientTransformation:
    """``optax.apply_if_finite`` without the ``lax.cond``.

    Identical accept/reject logic, bit-exact state evolution, and the
    same ``ApplyIfFiniteState`` (checkpoints interchange; update values
    agree to float rounding), but the gate is a
    per-leaf ``where`` select instead of a conditional: the round-5
    train-step trace showed optax's ``lax.cond`` copying the full
    optimizer state through the branch (~2.5 GB accessed, ~2 ms/step at
    the bench shape), while selects fuse into the per-leaf optimizer
    fusions for free. The inner update always runs; on a rejected step
    its (NaN-poisoned) outputs are discarded by the select, exactly as
    the cond's untaken branch would have been.
    """
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return optax.ApplyIfFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            last_finite=jnp.array(True, jnp.bool_),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update(updates, state, params=None, **extra):
        leaves = jax.tree.leaves(updates)
        isfinite = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(p)) for p in leaves])
        )
        notfinite_count = jnp.where(
            isfinite,
            jnp.zeros([], jnp.int32),
            optax.safe_increment(state.notfinite_count),
        )
        accept = jnp.logical_or(isfinite, notfinite_count > max_consecutive_errors)
        new_updates, new_inner = inner.update(
            updates, state.inner_state, params, **extra
        )
        out_updates = jax.tree.map(
            lambda u: jnp.where(accept, u, jnp.zeros_like(u)), new_updates
        )
        out_inner = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old),
            new_inner, state.inner_state,
        )
        return out_updates, optax.ApplyIfFiniteState(
            notfinite_count=notfinite_count,
            last_finite=isfinite,
            total_notfinite=jnp.where(
                isfinite, state.total_notfinite,
                optax.safe_increment(state.total_notfinite),
            ),
            inner_state=out_inner,
        )

    return optax.GradientTransformationExtraArgs(init, update)


def _scale_by_tree(scales: Any) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    params: Any,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    layer_decay: float = 0.75,
    depth: int = 12,
    steps_per_epoch: int = 1000,
    decay_epochs: Sequence[int] = (8, 11),
    warmup_iters: int = 500,
    warmup_ratio: float = 1e-3,
    accumulate_steps: int = 2,
    grad_clip: float | None = None,
    skip_nonfinite: int | None = 100,
) -> optax.GradientTransformation:
    """The full train-recipe optimizer as one optax transformation.

    ``skip_nonfinite``: steps whose gradients contain inf/NaN are skipped
    (parameters and optimizer state untouched) up to this many times in a
    row — the TPU-native analog of apex AMP's overflow-skip behaviour
    (`mmdet/utils/optimizer.py:10-38` relies on ``amp.scale_loss``
    rejecting overflowed steps); the reference's fp16 path silently
    survives transient spikes this way while a bare bf16 optimizer would
    poison the parameters. ``None`` disables the guard.
    """
    sched = step_lr_schedule(
        base_lr, steps_per_epoch, decay_epochs, warmup_iters=warmup_iters,
        warmup_ratio=warmup_ratio,
    )
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain += [
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask(params)),
        _scale_by_tree(lr_scale_tree(params, layer_decay, depth)),
        optax.scale_by_learning_rate(sched),
    ]
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    if skip_nonfinite is not None:
        tx = apply_if_finite_fused(tx, max_consecutive_errors=skip_nonfinite)
    return tx


def build_sgd_optimizer(
    params: Any,
    base_lr: float = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    steps_per_epoch: int = 1000,
    decay_epochs: Sequence[int] = (8, 11),
    warmup_iters: int = 500,
    warmup_ratio: float = 1e-3,
    accumulate_steps: int = 1,
    grad_clip: float | None = None,
    frozen_stages: int = 1,
    skip_nonfinite: int | None = 100,
) -> optax.GradientTransformation:
    """Stock detection recipe (mmdet ``SGD momentum=0.9 wd=1e-4`` +
    `schedule_1x`), for the Mask R-CNN refinement stage.
    ``frozen_stages`` must match the backbone's so frozen params are
    excluded from weight decay (their grads are already zero).
    ``skip_nonfinite``: see ``build_optimizer``."""
    sched = step_lr_schedule(
        base_lr, steps_per_epoch, decay_epochs, warmup_iters=warmup_iters,
        warmup_ratio=warmup_ratio,
    )
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain += [
        optax.add_decayed_weights(
            weight_decay, mask=weight_decay_mask(params, frozen_stages)
        ),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(sched),
    ]
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    if skip_nonfinite is not None:
        tx = apply_if_finite_fused(tx, max_consecutive_errors=skip_nonfinite)
    return tx
