"""Tensor-parallel sharding rules for the transformer blocks.

The reference has no TP (SURVEY.md section 2.11 — DDP only); this is the
TPU-native scaling extension: Megatron-style column/row parallelism over
the mesh's ``model`` axis, expressed purely as ``NamedSharding``
placements on the parameter tree. XLA's GSPMD propagates the shardings
through the computation and inserts the all-reduces — no manual
collectives:

- ``qkv`` / ``fc1`` kernels: column-parallel (output features split) —
  each shard computes its own heads / hidden slice;
- ``proj`` / ``fc2`` kernels: row-parallel (input features split) — the
  matmul partial sums are all-reduced;
- 1-D biases of column-parallel layers split with their features.

Rules apply to every module whose path ends with the standard
``attn.{qkv,proj}`` / ``mlp.{fc1,fc2}`` names (the ViT backbone and the
ViT-decoder RoI heads alike). A dimension that does not divide the
``model`` axis falls back to replication, so uneven heads degrade
gracefully instead of failing placement.

The fused pallas attention kernels compose with TP via
``ops.attention.attention_*_sharded``: under an active mesh with a >1
``model`` axis they run inside ``shard_map`` with heads sharded on
``model`` and the head-averaged capture reconstructed with one psum.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_spec_tree", "shard_params_tp", "shard_opt_state_tp"]

# (path suffix, spec) — first match wins. Suffixes are scoped to the
# attn/mlp submodules: a bare ("proj", "kernel") would also catch the
# patch-embed conv (timm names it ``proj`` too), whose 4-D kernel must
# stay replicated.
TP_RULES: list[tuple[tuple[str, ...], P]] = [
    (("attn", "qkv", "kernel"), P(None, "model")),
    (("attn", "qkv", "bias"), P("model")),
    (("attn", "proj", "kernel"), P("model", None)),
    (("mlp", "fc1", "kernel"), P(None, "model")),
    (("mlp", "fc1", "bias"), P("model")),
    (("mlp", "fc2", "kernel"), P("model", None)),
]


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


def _spec_for(path: tuple[str, ...], shape: tuple[int, ...], tp: int) -> P:
    for suffix, spec in TP_RULES:
        if path[-len(suffix):] == suffix:
            # divisibility guard per sharded axis
            ok = True
            for axis, name in enumerate(spec):
                if name == "model" and shape[axis] % tp != 0:
                    ok = False
            if ok:
                return spec
            return P()
    return P()


def tp_spec_tree(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for ``params`` under the mesh's model axis."""
    tp = mesh.shape["model"]

    def one(kp, leaf):
        return _spec_for(_key_path(kp), leaf.shape, tp)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` with TP specs (replicated where no rule matches)."""
    specs = tp_spec_tree(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_opt_state_tp(opt_state: Any, mesh: Mesh) -> Any:
    """Place optimizer state with the parameter TP specs.

    Optimizer moments (adam mu/nu, MultiSteps acc_grads) mirror the
    parameter tree, so their key paths end with the same
    ``attn.qkv.kernel``-style suffixes the TP_RULES match on; scalar
    bookkeeping leaves (step counts, schedules) match no rule and stay
    replicated. This is the same spec tree production training uses —
    sharding it here keeps the dryrun honest about optimizer placement.
    """
    return shard_params_tp(opt_state, mesh)
