from .mesh import (
    batch_sharding,
    make_mesh,
    mesh_from_config,
    place_state,
    replicate,
    shard_batch,
)
from .pp import gpipe, shard_stage_params, stack_stage_params

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "mesh_from_config",
    "place_state",
    "gpipe",
    "shard_stage_params",
    "stack_stage_params",
]
