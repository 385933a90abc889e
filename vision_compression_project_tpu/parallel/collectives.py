"""Collective building blocks used by retrieval and the sharded index.

The reference's retrieval is one HTTPS call to a cloud index
(reference: backend/app/pipeline/qa.py:37-99).  Here the index rows live
sharded across the `data` axis in HBM; a query is answered by a local
masked-matmul top-k per shard followed by a cross-shard merge — an all-gather
of (k) candidates per shard, which is tiny, rather than gathering the full
score vector.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import AXIS_DATA


def _local_then_merge_topk(scores: jnp.ndarray, k: int, axis_name: str):
    """Inside shard_map: scores is the local shard (rows_local,) of a global
    score vector sharded over `axis_name`.  Returns the global top-k
    (values, global_row_indices), replicated."""
    rows_local = scores.shape[-1]
    local_vals, local_idx = jax.lax.top_k(scores, k)
    shard = jax.lax.axis_index(axis_name)
    global_idx = local_idx + shard * rows_local
    # Gather the k candidates from every shard: (n_shards*k,) — tiny.
    all_vals = jax.lax.all_gather(local_vals, axis_name, axis=0, tiled=True)
    all_idx = jax.lax.all_gather(global_idx, axis_name, axis=0, tiled=True)
    merged_vals, merged_pos = jax.lax.top_k(all_vals, k)
    return merged_vals, jnp.take(all_idx, merged_pos, axis=0)


def distributed_topk(
    mesh: Mesh, scores_sharded: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global top-k over a score vector whose rows are sharded over `data`.

    scores_sharded: (rows_global,) array laid out with NamedSharding(P('data')).
    Returns replicated (values, indices) of shape (k,).
    """
    fn = shard_map(
        functools.partial(_local_then_merge_topk, k=k, axis_name=AXIS_DATA),
        mesh=mesh,
        in_specs=P(AXIS_DATA),
        out_specs=P(),
        check_vma=False,
    )
    return fn(scores_sharded)


def ring_all_gather_rows(mesh: Mesh, shard_rows: jnp.ndarray) -> jnp.ndarray:
    """All-gather row-sharded embeddings into a replicated matrix.

    Used when (re)building a replicated HBM index from per-shard additions.
    XLA lowers this to a ring all-gather on ICI.
    """
    fn = shard_map(
        lambda x: jax.lax.all_gather(x, AXIS_DATA, axis=0, tiled=True),
        mesh=mesh,
        in_specs=P(AXIS_DATA, None),
        out_specs=P(),
        check_vma=False,
    )
    return fn(shard_rows)
