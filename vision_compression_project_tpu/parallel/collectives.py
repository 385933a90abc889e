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


def _local_score_merge(
    rows_l: jnp.ndarray, mask_l: jnp.ndarray, q: jnp.ndarray, k: int
):
    """Inside shard_map: local masked matmul + top-k, then a tiny
    all-gather merge of k candidates per shard.  rows_l: (r_local, D);
    mask_l: (r_local,); q: (Q, D) replicated.  Returns replicated
    ((Q, k) values, (Q, k) global row indices)."""
    scores = jnp.einsum(
        "qd,rd->qr", q.astype(jnp.float32), rows_l.astype(jnp.float32)
    )
    scores = jnp.where(mask_l[None, :] > 0, scores, -1e30)
    vals, idx = jax.lax.top_k(scores, k)
    shard = jax.lax.axis_index(AXIS_DATA)
    gidx = idx + shard * rows_l.shape[0]
    all_vals = jax.lax.all_gather(vals, AXIS_DATA, axis=1, tiled=True)
    all_idx = jax.lax.all_gather(gidx, AXIS_DATA, axis=1, tiled=True)
    mvals, mpos = jax.lax.top_k(all_vals, k)
    return mvals, jnp.take_along_axis(all_idx, mpos, axis=1)


@functools.partial(jax.jit, static_argnames=("mesh", "k"))
def sharded_cosine_topk(
    mesh: Mesh,
    rows_sharded: jnp.ndarray,
    mask_sharded: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-query masked cosine top-k over row-sharded index embeddings.

    rows_sharded: (R, D) with NamedSharding(P('data', None)); mask_sharded:
    (R,) with P('data'); queries: (Q, D) replicated unit-norm.  The merge
    traffic is k candidates per shard per query (tiny, rides ICI) instead of
    full score vectors.  Returns replicated ((Q, k) values, (Q, k) indices).
    """
    fn = shard_map(
        functools.partial(_local_score_merge, k=k),
        mesh=mesh,
        in_specs=(P(AXIS_DATA, None), P(AXIS_DATA), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(rows_sharded, mask_sharded, queries)


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
