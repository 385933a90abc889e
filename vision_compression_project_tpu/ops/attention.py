"""Blockwise flash attention (Pallas, TPU).

Online-softmax tiled attention: per q-block, stream k/v blocks, carry running
(max, sum, acc) in f32, never materializing the (S, S) score matrix in HBM.
Replaces nothing in the reference (its models were cloud APIs); this is the
framework's core attention for the vision encoder (windowed => reshape to
windows and call non-causal), the LM decoder prefill (causal), and — via the
`kv_len` operand — ragged page batches under XLA static shapes
(SURVEY.md §7 "Variable page counts / ragged batches").

Single-token decode steps intentionally use plain XLA einsums against the KV
cache (models/decoder.py): a bq=1 Pallas matmul cannot feed the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cdiv, interpret_mode

NEG_INF = -1e30


def _flash_kernel(
    kv_len_ref,  # scalar-prefetch (B,) int32: valid kv length per batch element
    q_ref,       # (1, 1, bq, d)
    k_ref,       # (1, 1, s, d)
    v_ref,       # (1, 1, s, d)
    o_ref,       # (1, 1, bq, d)
    *,
    scale: float,
    causal: bool,
    block_k: int,
):
    bq = q_ref.shape[2]
    d = q_ref.shape[3]
    iq = pl.program_id(2)
    kv_len = kv_len_ref[pl.program_id(0)]

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, d)

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    if causal:
        # Only k-blocks at or left of the q-block diagonal contribute.
        num_kb = jnp.minimum(
            (iq + 1) * bq + block_k - 1, kv_len + block_k - 1
        ) // block_k
    else:
        num_kb = (kv_len + block_k - 1) // block_k

    q_idx = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        k_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1
        )
        mask = k_idx < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_idx <= q_idx)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k"),
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
) -> jnp.ndarray:
    """Attention over (B, H, S, D) tensors; supports GQA (Hkv divides H).

    kv_len: optional (B,) int32 of valid key lengths (ragged batches).
    Differentiable: forward runs the Pallas kernel; the backward pass
    recomputes attention weights in XLA (flash-style recompute — no (S,S)
    residuals are saved).
    """
    b, h, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    assert h % hkv == 0, (h, hkv)
    if scale is None:
        scale = d ** -0.5
    if kv_len is None:
        kv_len = jnp.full((b,), sk, jnp.int32)
    # Ragged sequence lengths: pad q/k/v up to the block size so the kernel
    # grid tiles exactly; padded keys are masked via kv_len (which records
    # the TRUE length) and padded query rows are sliced off the output.
    # This keeps the Pallas kernel on every training shape (e.g. the
    # 2046-token VLM forward) instead of falling back to materialized
    # (S, S) XLA attention.
    pq = (-sq) % block_q
    pk = (-sk) % block_k
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))
        kv_len = jnp.minimum(kv_len, sk)
    block_q = min(block_q, q.shape[2])
    block_k = min(block_k, k.shape[2])
    # float carrier so custom_vjp can emit a well-typed zero cotangent.
    kv_len_f = kv_len.astype(jnp.float32).reshape(b)
    core = _flash_core(causal, float(scale), block_q, block_k)
    out = core(q, k, v, kv_len_f)
    return out[:, :, :sq] if pq else out


@functools.lru_cache(maxsize=32)
def _flash_core(causal: bool, scale: float, block_q: int, block_k: int):
    """custom_vjp-wrapped kernel launcher for one static config."""

    def fwd_impl(q, k, v, kv_len_f):
        return _flash_forward(q, k, v, kv_len_f, causal, scale, block_q, block_k)

    @jax.custom_vjp
    def core(q, k, v, kv_len_f):
        return fwd_impl(q, k, v, kv_len_f)

    def core_fwd(q, k, v, kv_len_f):
        return fwd_impl(q, k, v, kv_len_f), (q, k, v, kv_len_f)

    def core_bwd(residuals, g):
        # Flash-style backward: recompute attention in q-chunks under a
        # lax.scan, accumulating dk/dv — peak temp is (B, H, C, Sk), never
        # the full (B, H, Sq, Sk) score matrix (which at 2k-seq training
        # was a 3 GB f32 allocation per layer and OOM'd v5e HBM).
        q, k, v, kv_len_f = residuals
        b, h, sq, d = q.shape
        sk = k.shape[2]
        hkv = k.shape[1]
        group = h // hkv
        chunk = min(256, sq)
        pq = (-sq) % chunk
        qf = q.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        if pq:
            qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pq), (0, 0)))
            gf = jnp.pad(gf, ((0, 0), (0, 0), (0, pq), (0, 0)))
        nc = qf.shape[2] // chunk
        kr = jnp.repeat(k, group, axis=1).astype(jnp.float32)
        vr = jnp.repeat(v, group, axis=1).astype(jnp.float32)
        k_idx = jnp.arange(sk)[None, None, None, :]
        kv_mask = k_idx < kv_len_f[:, None, None, None]

        qc = qf.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)
        gc = gf.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)

        def body(carry, inp):
            dk_acc, dv_acc = carry
            ci, q_i, g_i = inp  # (), (B,H,C,D), (B,H,C,D)
            s = jnp.einsum("bhqd,bhkd->bhqk", q_i, kr) * scale
            mask = kv_mask
            if causal:
                q_pos = ci * chunk + jnp.arange(chunk)[None, None, :, None]
                mask = jnp.logical_and(mask, k_idx <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
            p = jax.nn.softmax(s, axis=-1)
            dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, g_i)
            dp = jnp.einsum("bhqd,bhkd->bhqk", g_i, vr)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq_i = jnp.einsum("bhqk,bhkd->bhqd", ds, kr) * scale
            dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, q_i) * scale
            return (dk_acc, dv_acc), dq_i

        zeros = jnp.zeros((b, h, sk, d), jnp.float32)
        (dk, dv), dq_chunks = jax.lax.scan(
            body, (zeros, zeros), (jnp.arange(nc), qc, gc)
        )
        dq = dq_chunks.transpose(1, 2, 0, 3, 4).reshape(b, h, nc * chunk, d)[
            :, :, :sq
        ]
        # GQA: fold query-head groups back onto their shared kv head.
        dk = dk.reshape(b, hkv, group, sk, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, sk, d).sum(axis=2)
        return (
            dq.astype(q.dtype),
            dk.astype(k.dtype),
            dv.astype(v.dtype),
            jnp.zeros_like(kv_len_f),
        )

    core.defvjp(core_fwd, core_bwd)
    return core


def _flash_forward(q, k, v, kv_len_f, causal, scale, block_q, block_k):
    b, h, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    group = h // hkv
    kv_len = kv_len_f.astype(jnp.int32)

    grid = (b, h, cdiv(sq, block_q))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda ib, ih, iq, *_: (ib, ih, iq, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sk, d),
                lambda ib, ih, iq, *_: (ib, ih // group, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, sk, d),
                lambda ib, ih, iq, *_: (ib, ih // group, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda ib, ih, iq, *_: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=scale,
            causal=causal,
            block_k=block_k,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret_mode(),
    )(kv_len, q, k, v)


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: Optional[jnp.ndarray] = None,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Pure-XLA attention used to validate the Pallas kernel (and as the
    CPU-mesh fallback inside models when shapes are tiny)."""
    b, h, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    group = h // hkv
    if group > 1:
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    k_idx = jnp.arange(sk)[None, None, None, :]
    mask = jnp.ones((b, 1, 1, sk), bool)
    if kv_len is not None:
        mask = k_idx < kv_len[:, None, None, None]
    if causal:
        q_idx = jnp.arange(sq)[None, None, :, None]
        mask = jnp.logical_and(mask, k_idx <= q_idx)
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)
