"""Ring attention: sequence-parallel attention over the mesh `seq` axis.

The framework's long-context capability (SURVEY.md §2.5): a whole document's
vision tokens (hundreds of pages x 256 tokens) can be attended jointly even
when the sequence is sharded across chips.  Each shard holds a q block and
rotates its k/v shard around the ring with `jax.lax.ppermute` (ICI
neighbor exchange), combining partial results with the same online-softmax
update the Pallas flash kernel uses — so memory stays O(S/n) per chip and
communication is overlap-friendly ring traffic, never an all-gather of the
full sequence.

XLA-collective implementation (ppermute inside shard_map); the per-step
local attention is the blockwise computation XLA already fuses well.  A
Pallas RDMA variant (make_async_remote_copy double-buffering) is the
planned upgrade once profiling shows the XLA ring on the critical path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _local_attn_update(q, k, v, m, l, acc, q_offset, k_offset, causal, scale,
                       kv_len=None):
    """One online-softmax update of (m, l, acc) with a k/v shard.
    kv_len: optional (B,) valid key lengths (ragged batches)."""
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    sq, sk = q.shape[2], k.shape[2]
    q_idx = q_offset + jnp.arange(sq)[None, None, :, None]
    k_idx = k_offset + jnp.arange(sk)[None, None, None, :]
    if causal:
        s = jnp.where(k_idx <= q_idx, s, NEG_INF)
    if kv_len is not None:
        s = jnp.where(k_idx < kv_len[:, None, None, None], s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * corr + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str = "seq",
    causal: bool = False,
    scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
    head_axis: Optional[str] = None,
    kv_len: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over (B, H, S, D) with S sharded over `axis_name`.

    Returns output with the same sharding as q.  Requires S divisible by the
    axis size.  `batch_axis`/`head_axis` optionally co-shard the batch and
    head dims over other mesh axes (DP/TP composing with SP) — those dims
    are embarrassingly parallel through the ring, so the only cross-chip
    traffic stays the seq-axis ppermute.
    """
    b, h, s, d = q.shape
    n = mesh.shape[axis_name]
    assert s % n == 0, (s, n)
    if scale is None:
        scale = d ** -0.5

    def ring_fn(q_shard, k_shard, v_shard, kv_len_shard):
        # q_shard: (B, H, S/n, D) — this chip's query block.
        idx = jax.lax.axis_index(axis_name)
        chunk = q_shard.shape[2]
        q_offset = idx * chunk
        m = jnp.full(q_shard.shape[:3] + (1,), NEG_INF, jnp.float32)
        l = jnp.zeros_like(m)
        acc = jnp.zeros(q_shard.shape, jnp.float32)

        def step(i, carry):
            m, l, acc, k_cur, v_cur = carry
            # k/v shard currently held started life on chip (idx - i) % n.
            src = (idx - i) % n
            k_offset = src * chunk
            m, l, acc = _local_attn_update(
                q_shard, k_cur, v_cur, m, l, acc, q_offset, k_offset,
                causal, scale, kv_len=kv_len_shard,
            )
            # Rotate: send current k/v to the next chip in the ring.
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            return m, l, acc, k_nxt, v_nxt

        m, l, acc, _, _ = jax.lax.fori_loop(
            0, n, step, (m, l, acc, k_shard, v_shard)
        )
        return (acc / jnp.maximum(l, 1e-30)).astype(q_shard.dtype)

    if batch_axis is not None:
        assert b % mesh.shape[batch_axis] == 0, (b, batch_axis)
    if head_axis is not None:
        assert h % mesh.shape[head_axis] == 0, (h, head_axis)
    # Ragged masking rides as (B,) lengths, replicated over seq/heads and
    # co-sharded with the batch axis; a full-length vector keeps one code
    # path when no mask was given.
    if kv_len is None:
        kv_len = jnp.full((b,), s, jnp.int32)
    spec = P(batch_axis, head_axis, axis_name, None)
    len_spec = P(batch_axis)
    fn = shard_map(
        ring_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, len_spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v, kv_len.astype(jnp.int32))


def ring_attention_sharded_inputs(mesh: Mesh, q, k, v, **kwargs):
    """Convenience: device_put replicated inputs into seq-sharded layout and
    run ring attention."""
    spec = NamedSharding(mesh, P(None, None, "seq", None))
    q = jax.device_put(q, spec)
    k = jax.device_put(k, spec)
    v = jax.device_put(v, spec)
    return ring_attention(mesh, q, k, v, **kwargs)
