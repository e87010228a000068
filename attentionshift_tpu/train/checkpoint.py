"""Orbax checkpointing: save/resume the full TrainState + data cursor.

Reproduces the reference's checkpoint capabilities (SURVEY.md section 5):
per-epoch checkpoints, auto-resume from the latest one
(`mmdet/apis/train.py:182-197`), full optimizer/scaler/epoch state
(`mmcv_custom/checkpoint.py:438-500` — the amp scaler has no bf16
analog), and weight-only export for publishing.
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

__all__ = [
    "save_checkpoint",
    "latest_checkpoint",
    "restore_checkpoint",
    "restore_params",
    "save_params",
]


def _ckpt_dir(work_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(work_dir), f"epoch_{epoch}")


def save_checkpoint(work_dir: str, state: TrainState, extra: dict | None = None) -> str:
    """Write ``work_dir/epoch_N`` (N = state.epoch) atomically."""
    epoch = int(state.epoch)
    path = _ckpt_dir(work_dir, epoch)
    payload = {
        "step": np.asarray(state.step),
        "epoch": np.asarray(state.epoch),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(work_dir: str) -> str | None:
    """auto_resume glob over ``work_dir/epoch_*`` (highest epoch wins)."""
    if not os.path.isdir(work_dir):
        return None
    best, best_ep = None, -1
    for name in os.listdir(work_dir):
        m = re.fullmatch(r"epoch_(\d+)", name)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = os.path.join(os.path.abspath(work_dir), name)
    return best


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an abstract-compatible TrainState (same tx/shapes)."""
    template = {
        "step": np.asarray(state.step),
        "epoch": np.asarray(state.epoch),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        epoch=jax.numpy.asarray(restored["epoch"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


def restore_params(path: str) -> Any:
    """Params-only restore, independent of the training optimizer config.

    ``restore_checkpoint`` needs a structurally identical ``opt_state``
    template, which forces eval-side tools to reconstruct the exact
    training optimizer (accumulation steps, non-finite guard, ...).
    Instead, build the full template from the checkpoint's own metadata
    (shapes/dtypes) and return just the parameter tree. Also accepts
    weight-only ``save_params`` exports (no ``params`` key nesting
    difference — both layouts carry a top-level ``params``).
    """
    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path).item_metadata

    def is_leaf(x):
        return hasattr(x, "shape") and not isinstance(x, dict)

    template = jax.tree.map(
        lambda m: np.zeros(m.shape, m.dtype), meta, is_leaf=is_leaf
    )
    restored = ckptr.restore(path, template)
    return restored["params"]


def save_params(path: str, params: Any) -> str:
    """Weight-only export (`tools/model_converters/publish_model.py` analog)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"params": jax.device_get(params)}, force=True)
    ckptr.wait_until_finished()
    return path
