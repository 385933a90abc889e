"""Masked cosine similarity + top-k over an HBM-resident embedding matrix.

TPU-native replacement for the reference's cloud vector search
(reference: backend/app/pipeline/qa.py:37-99, incl. its server-side
{'doc_id': ...} filter and client-side over-fetch fallback): the index rows
live in HBM, filtering is a fused multiplicative mask inside the scoring
kernel (no over-fetch, exact), and top-k runs on device.  The sharded
variant merges per-shard candidates via parallel/collectives.distributed_topk.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode

NEG_INF = -1e30


def _score_kernel(emb_ref, q_ref, mask_ref, out_ref):
    # emb_ref: (tn, d); q_ref: (bq, d); mask_ref: (1, tn); out_ref: (bq, tn)
    s = jax.lax.dot_general(
        q_ref[:].astype(jnp.float32),
        emb_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.where(mask_ref[:] > 0, s, NEG_INF)


@functools.partial(jax.jit, static_argnames=("block_n",))
def masked_similarity(
    emb: jnp.ndarray,
    queries: jnp.ndarray,
    mask: jnp.ndarray,
    block_n: int = 1024,
) -> jnp.ndarray:
    """scores[b, n] = <queries[b], emb[n]> where mask[n] > 0 else -inf.

    emb: (N, D) index rows (unit-norm at ingest time => dot == cosine).
    queries: (B, D) unit-norm query embeddings.
    mask: (N,) float/int row filter (doc_id membership).
    """
    n, d = emb.shape
    bq = queries.shape[0]
    block_n = min(block_n, n)
    mask2 = mask.reshape(1, n).astype(jnp.float32)
    grid = (cdiv(n, block_n),)
    return pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bq, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bq, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * n * d,
            bytes_accessed=emb.size * emb.dtype.itemsize + 4 * bq * (n + d),
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(emb, queries, mask2)


def masked_similarity_reference(
    emb: jnp.ndarray, queries: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    s = jnp.einsum(
        "bd,nd->bn", queries.astype(jnp.float32), emb.astype(jnp.float32)
    )
    return jnp.where(mask.reshape(1, -1) > 0, s, NEG_INF)


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    emb: jnp.ndarray,
    queries: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k masked cosine matches: returns (values (B,k), indices (B,k))."""
    scores = masked_similarity(emb, queries, mask)
    return jax.lax.top_k(scores, k)
