"""Device mesh + sharding helpers (the DP backend).

The reference scales with torch.distributed.launch + DDP/NCCL
(`run_train.py:9`, `mmdet/apis/train.py:96`, SURVEY.md section 2.11). The
TPU-native equivalent is a ``jax.sharding.Mesh`` over ICI with parameters
replicated and the batch sharded on a ``data`` axis; XLA inserts the
gradient all-reduce when the jitted loss averages over the sharded batch
— no DDP hook machinery.

A ``model`` axis is declared for tensor-parallel extensions; the current
model shards only data over it (mesh shape (N, 1)).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding"]


def make_mesh(
    devices: Sequence[Any] | None = None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """(data, model) mesh over the given (or all) devices.

    ``model > 1`` enables tensor parallelism (see ``parallel.tp``); the
    data extent is derived as ``len(devices) // model``.
    """
    if devices is None:
        devices = jax.devices()
    if data is not None:
        devices = devices[: data * model]
    n = len(devices)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    arr = np.asarray(devices).reshape(n // model, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in ``batch`` with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters / optimizer state)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
