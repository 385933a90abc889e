"""Logical-axis sharding rules and helpers.

Parameters and activations are annotated with *logical* axis names (via
`flax.linen.with_partitioning` / `with_logical_constraint`); the rules table
below maps logical names onto the physical mesh axes from `mesh.py`.  This is
the scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_EXPERT, AXIS_MODEL, AXIS_SEQ

# logical axis -> mesh axis (None = replicated).
LOGICAL_RULES = (
    ("batch", AXIS_DATA),          # page/example batch
    ("seq", AXIS_SEQ),             # activation sequence (SP/CP)
    ("embed", None),               # residual stream: replicated
    ("vit_embed", None),           # vision-encoder output width
    ("embed_out", None),           # projection output width
    ("heads", AXIS_MODEL),         # attention heads (TP)
    ("kv_heads", AXIS_MODEL),
    ("head_dim", None),
    ("mlp", AXIS_MODEL),           # FFN hidden (TP)
    ("vocab", AXIS_MODEL),         # embedding/unembedding vocab shard (TP)
    ("expert", AXIS_EXPERT),       # MoE experts (EP)
    ("patch", None),
    ("index_rows", AXIS_DATA),     # vector-index rows shard over data axis
    ("index_dim", None),
)


def logical_sharding(
    logical_axes: Sequence[Optional[str]], mesh: Mesh
) -> NamedSharding:
    """NamedSharding for an array whose dims carry the given logical names."""
    spec = nn.logical_to_mesh_axes(tuple(logical_axes), rules=LOGICAL_RULES)
    return NamedSharding(mesh, P(*spec))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device_put a Flax param pytree according to its logical annotations.

    Params created under `nn.with_partitioning` carry `nn.Partitioned`
    metadata; everything unannotated is replicated.
    """
    spec_tree = nn.get_partition_spec(params)
    spec_tree = nn.logical_to_mesh(spec_tree, rules=LOGICAL_RULES)

    def _put(x, spec):
        if not isinstance(spec, P):
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    leaves = jax.tree_util.tree_map(
        _put, nn.meta.unbox(params), spec_tree, is_leaf=lambda x: x is None
    )
    return leaves


def data_sharding(mesh: Mesh, *trailing: Optional[str]) -> NamedSharding:
    """Batch-sharded over the data axis; trailing dims as given mesh axes."""
    return NamedSharding(mesh, P(AXIS_DATA, *trailing))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _thread_resources():
    try:  # maintained home (jax.interpreters.pxla alias is deprecated)
        from jax._src.mesh import thread_resources
    except ImportError:  # pragma: no cover - older jax
        from jax.interpreters.pxla import thread_resources
    return thread_resources


def active_mesh() -> Optional[Mesh]:
    """The mesh entered via `with mesh:` around the enclosing jit/trace,
    or None when no mesh context is active (single-chip serving, CPU
    tests).  Model code uses this to engage mesh-dependent paths (e.g. the
    ring-attention SP path in models/layers.py) from inside a forward."""
    mesh = _thread_resources().env.physical_mesh
    return None if mesh.empty else mesh


def constrain(x, logical_axes: Sequence[Optional[str]]):
    """Sharding constraint by logical names under the active mesh context;
    no-op when no mesh is active (single-chip serving, CPU tests).

    This is how sequence parallelism (SP) materializes: activations
    constrained to ('batch', 'seq', 'embed') are physically sharded over the
    mesh seq axis whenever that axis is >1."""
    mesh = _thread_resources().env.physical_mesh
    if mesh.empty:
        return x
    spec = nn.logical_to_mesh_axes(tuple(logical_axes), rules=LOGICAL_RULES)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
