"""TrainState: the complete resumable training state as one pytree.

Replaces the reference's runner/optimizer/amp checkpoint trio
(`mmcv_custom/runner/epoch_based_runner.py:23-107`,
`mmcv_custom/checkpoint.py:438-500`): params, optimizer state, and the
step/epoch counters live in a single flax struct that orbax can
save/restore atomically. No amp scaler state is needed (bf16).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState"]


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # global optimizer-visible step (micro-steps)
    epoch: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads: Any) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt)

    def next_epoch(self) -> "TrainState":
        return self.replace(epoch=self.epoch + 1)
