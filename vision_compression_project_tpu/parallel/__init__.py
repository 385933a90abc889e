from .mesh import (
    AXIS_DATA,
    AXIS_SEQ,
    AXIS_MODEL,
    AXIS_EXPERT,
    MESH_AXES,
    MeshConfig,
    build_mesh,
    local_mesh,
)
from .sharding import (
    LOGICAL_RULES,
    logical_sharding,
    shard_params,
    data_sharding,
    replicated,
)
from .collectives import distributed_topk, ring_all_gather_rows
from .pipeline import gpipe, shard_stacked_params

__all__ = [
    "AXIS_DATA",
    "AXIS_SEQ",
    "AXIS_MODEL",
    "AXIS_EXPERT",
    "MESH_AXES",
    "MeshConfig",
    "build_mesh",
    "local_mesh",
    "LOGICAL_RULES",
    "logical_sharding",
    "shard_params",
    "data_sharding",
    "replicated",
    "distributed_topk",
    "ring_all_gather_rows",
    "gpipe",
    "shard_stacked_params",
]
