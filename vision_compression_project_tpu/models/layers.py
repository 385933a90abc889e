"""Transformer building blocks (Flax linen) with logical-axis sharding.

Every parameter carries logical axis names (see parallel/sharding.py rules):
`heads`/`mlp`/`vocab`/`expert` map onto the mesh `model`/`expert` axes, so a
single `shard_params` call TP/EP-shards any model built from these blocks.
Attention runs the Pallas flash kernel (ops/attention.py) for sequence
processing and plain XLA einsums against the KV cache for single-token decode.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import flash_attention, mha_reference


def _use_flash(s: int, head_dim: int) -> bool:
    """Pallas flash for long sequences; VCP_FORCE_XLA_ATTENTION=1 forces the
    XLA reference path everywhere — on CPU the Pallas kernel runs in
    interpret mode (minutes per call at 512px+ presets), so this is what
    makes big-preset checkpoints evaluable off-TPU."""
    import os

    if os.environ.get("VCP_FORCE_XLA_ATTENTION") == "1":
        return False
    return s >= 128 and head_dim % 8 == 0

Dtype = Any


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


import contextlib
import threading

_plain_mode = threading.local()


@contextlib.contextmanager
def plain_partitioning():
    """Disable logical-axis param metadata within the context.

    Needed inside shard_map (manual-mesh) regions: flax DenseGeneral
    re-derives its init metadata at apply time and unboxes it with a
    sharding constraint built from the RAW logical names, which are not mesh
    axes — the PP stage runner (train/pp_forward.py) wraps block application
    in this context so params stay plain there."""
    prev = getattr(_plain_mode, "on", False)
    _plain_mode.on = True
    try:
        yield
    finally:
        _plain_mode.on = prev


def dense_init(*logical_axes: Optional[str]):
    init = nn.initializers.lecun_normal()
    if getattr(_plain_mode, "on", False):
        return init
    return nn.with_partitioning(init, tuple(logical_axes))


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale",
            nn.with_partitioning(nn.initializers.ones_init(), ("embed",)),
            (x.shape[-1],),
        )
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.eps)
        return (normed * scale.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_table(head_dim: int, max_seq: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(max_seq, head_dim//2) cos/sin tables."""
    freqs = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(max_seq, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, S, D); cos/sin: (S, D//2) already sliced to the positions."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[None, None, :, :].astype(x.dtype)
    sin = sin[None, None, :, :].astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------

class Attention(nn.Module):
    """Multi-head attention with optional GQA, RoPE, causality and KV cache.

    `__call__` processes whole sequences (flash kernel); `decode` consumes a
    single token per batch element against an externally-carried cache.
    """

    heads: int
    kv_heads: int
    head_dim: int
    out_dim: int = 0  # residual-stream width; required (no lazy shape inference)
    causal: bool = False
    rope: bool = False
    rope_theta: float = 10000.0
    max_seq: int = 4096
    dtype: str = "bfloat16"

    def setup(self):
        dt = _dtype(self.dtype)
        self.wq = nn.DenseGeneral(
            (self.heads, self.head_dim), axis=-1, use_bias=False, dtype=dt,
            kernel_init=dense_init("embed", "heads", "head_dim"), name="wq",
        )
        self.wk = nn.DenseGeneral(
            (self.kv_heads, self.head_dim), axis=-1, use_bias=False, dtype=dt,
            kernel_init=dense_init("embed", "kv_heads", "head_dim"), name="wk",
        )
        self.wv = nn.DenseGeneral(
            (self.kv_heads, self.head_dim), axis=-1, use_bias=False, dtype=dt,
            kernel_init=dense_init("embed", "kv_heads", "head_dim"), name="wv",
        )
        assert self.out_dim > 0, "Attention.out_dim must be set"
        self.wo = nn.DenseGeneral(
            features=self.out_dim, axis=(-2, -1), use_bias=False, dtype=dt,
            kernel_init=dense_init("heads", "head_dim", "embed"), name="wo",
        )
        if self.rope:
            cos, sin = rope_table(self.head_dim, self.max_seq, self.rope_theta)
            self.rope_cos, self.rope_sin = cos, sin

    def _heads_first(self, x):
        return jnp.transpose(x, (0, 2, 1, 3))  # (B,S,H,D)->(B,H,S,D)

    def _seq_parallel_attn(self, q, k, v, kv_len):
        """Sequence-parallel path: when the active mesh shards `seq` (>1),
        whole-sequence attention runs the ppermute ring
        (ops/ring_attention.py) so each chip holds S/n of the sequence —
        the framework's SP/long-context mechanism, engaged from inside the
        model forward rather than as a standalone op.  Returns None (caller
        falls back to the single-shard kernels) when no seq sharding is
        active, the length doesn't divide, or we're already inside a
        manual (shard_map) region (the PP runner).  Ragged kv_len masks
        ride the ring as per-example lengths."""
        if getattr(_plain_mode, "on", False):
            return None
        from ..parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ
        from ..parallel.sharding import active_mesh

        mesh = active_mesh()
        if mesh is None or AXIS_SEQ not in mesh.shape:
            return None
        n = mesh.shape[AXIS_SEQ]
        if n <= 1 or q.shape[2] % n != 0:
            return None
        from ..ops.ring_attention import ring_attention

        group = self.heads // self.kv_heads
        if group > 1:  # the ring computes plain MHA; materialize GQA groups
            k = jnp.repeat(k, group, axis=1)
            v = jnp.repeat(v, group, axis=1)
        b, h = q.shape[0], q.shape[1]
        data = mesh.shape.get(AXIS_DATA, 1)
        model = mesh.shape.get(AXIS_MODEL, 1)
        return ring_attention(
            mesh, q, k, v,
            axis_name=AXIS_SEQ,
            causal=self.causal,
            batch_axis=AXIS_DATA if data > 1 and b % data == 0 else None,
            head_axis=AXIS_MODEL if model > 1 and h % model == 0 else None,
            kv_len=kv_len,  # ragged batches ride the ring too (round 3)
        )

    def __call__(
        self,
        x: jnp.ndarray,
        kv_len: Optional[jnp.ndarray] = None,
        positions_offset: int = 0,
    ) -> jnp.ndarray:
        b, s, _ = x.shape
        q = self._heads_first(self.wq(x))
        k = self._heads_first(self.wk(x))
        v = self._heads_first(self.wv(x))
        if self.rope:
            cos = jax.lax.dynamic_slice_in_dim(self.rope_cos, positions_offset, s)
            sin = jax.lax.dynamic_slice_in_dim(self.rope_sin, positions_offset, s)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        o = self._seq_parallel_attn(q, k, v, kv_len)
        if o is None:
            # The flash wrapper pads ragged lengths to its block size, so
            # any long sequence stays on the Pallas kernel (a 2046-token
            # fallback to materialized (S,S) XLA attention OOMs training).
            if _use_flash(s, self.head_dim):
                o = flash_attention(q, k, v, kv_len=kv_len, causal=self.causal)
            else:
                o = mha_reference(q, k, v, kv_len=kv_len, causal=self.causal)
        o = jnp.transpose(o, (0, 2, 1, 3))  # (B,S,H,D)
        return self.wo(o)

    def prefill(
        self,
        x: jnp.ndarray,
        kv_len: Optional[jnp.ndarray] = None,
        cache_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """Like __call__ but also returns a KV cache padded to `cache_len`.

        cache_len defaults to max_seq; generation right-sizes it to
        prompt+max_new so decode-step cache traffic is proportional to the
        actual generation budget, not the model's maximum context."""
        b, s, _ = x.shape
        cache_len = cache_len or self.max_seq
        q = self._heads_first(self.wq(x))
        k = self._heads_first(self.wk(x))
        v = self._heads_first(self.wv(x))
        if self.rope:
            cos, sin = self.rope_cos[:s], self.rope_sin[:s]
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        if _use_flash(s, self.head_dim):
            o = flash_attention(q, k, v, kv_len=kv_len, causal=self.causal)
        else:
            o = mha_reference(q, k, v, kv_len=kv_len, causal=self.causal)
        pad = cache_len - s
        cache = {
            "k": jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0))),
            "v": jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0))),
        }
        o = jnp.transpose(o, (0, 2, 1, 3))
        return self.wo(o), cache

    def decode(
        self, x: jnp.ndarray, cache: dict, pos: jnp.ndarray
    ) -> Tuple[jnp.ndarray, dict]:
        """x: (B, 1, dim); pos: () scalar or (B,) positions.

        Single-token step: XLA einsums against the HBM-resident cache (a
        bq=1 Pallas matmul cannot feed the MXU, see ops/attention.py).
        A scalar `pos` (lockstep batch — the common serving case, where all
        prompts share one padded length) takes the fast path: the new k/v
        row lands via dynamic_update_slice (in-place on the donated cache)
        instead of a full-cache masked rewrite."""
        b = x.shape[0]
        cache_len = cache["k"].shape[2]
        lockstep = pos.ndim == 0
        pos_b = pos if not lockstep else jnp.broadcast_to(pos, (b,))
        q = self._heads_first(self.wq(x))  # (B,H,1,D)
        k_new = self._heads_first(self.wk(x))  # (B,Hkv,1,D)
        v_new = self._heads_first(self.wv(x))
        if self.rope:
            # Per-element position: gather the rope rows.
            cos = jnp.take(self.rope_cos, pos_b, axis=0)[:, None, None, :]
            sin = jnp.take(self.rope_sin, pos_b, axis=0)[:, None, None, :]
            d2 = self.head_dim // 2

            def rot(t):
                t1, t2 = t[..., :d2], t[..., d2:]
                return jnp.concatenate(
                    [
                        t1 * cos.astype(t.dtype) - t2 * sin.astype(t.dtype),
                        t2 * cos.astype(t.dtype) + t1 * sin.astype(t.dtype),
                    ],
                    axis=-1,
                )

            q, k_new, v_new = rot(q), rot(k_new), v_new
        if lockstep:
            k = jax.lax.dynamic_update_slice(cache["k"], k_new, (0, 0, pos, 0))
            v = jax.lax.dynamic_update_slice(cache["v"], v_new, (0, 0, pos, 0))
        else:
            onehot = jax.nn.one_hot(pos_b, cache_len, dtype=cache["k"].dtype)
            keep_old = (1 - onehot)[:, None, :, None]
            k = cache["k"] * keep_old + jnp.einsum("bhod,bs->bhsd", k_new, onehot)
            v = cache["v"] * keep_old + jnp.einsum("bhod,bs->bhsd", v_new, onehot)
        # Grouped-query attention without materializing repeated k/v: fold
        # q heads as (kv_head, group) and contract against the shared cache
        # (decode is HBM-bandwidth-bound; repeat would read it group times).
        group = self.heads // self.kv_heads
        qg = q.reshape(b, self.kv_heads, group, self.head_dim)  # (B,Hkv,G,D)
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        s_scores = jnp.einsum(
            "bhgd,bhsd->bhgs", qg.astype(jnp.float32), kf
        ) * (self.head_dim ** -0.5)
        idx = jnp.arange(cache_len)[None, None, None, :]
        mask = idx <= pos_b[:, None, None, None]
        s_scores = jnp.where(mask, s_scores, -1e30)
        p = jax.nn.softmax(s_scores, axis=-1)
        o = jnp.einsum("bhgs,bhsd->bhgd", p, vf).astype(x.dtype)
        o = o.reshape(b, 1, self.heads, self.head_dim)  # (B,S=1,H,D)
        return self.wo(o), {"k": k, "v": v}


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

class SwiGLU(nn.Module):
    hidden: int
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        dt = _dtype(self.dtype)
        gate = nn.Dense(
            self.hidden, use_bias=False, dtype=dt,
            kernel_init=dense_init("embed", "mlp"), name="gate",
        )(x)
        up = nn.Dense(
            self.hidden, use_bias=False, dtype=dt,
            kernel_init=dense_init("embed", "mlp"), name="up",
        )(x)
        h = nn.silu(gate) * up
        return nn.Dense(
            x.shape[-1], use_bias=False, dtype=dt,
            kernel_init=dense_init("mlp", "embed"), name="down",
        )(h)


class SwitchMoE(nn.Module):
    """Top-1 (Switch) mixture of SwiGLU experts with capacity-based dispatch.

    Expert weights carry a leading `expert` logical axis -> sharded over the
    mesh `expert` axis (EP); dispatch/combine are einsums XLA turns into
    all-to-alls when tokens and experts live on different shards.
    """

    num_experts: int
    hidden: int
    capacity_factor: float = 1.25
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        dt = _dtype(self.dtype)
        b, s, d = x.shape
        tokens = b * s
        e = self.num_experts
        capacity = max(1, int(self.capacity_factor * tokens / e))

        router = nn.Dense(
            e, use_bias=False, dtype=jnp.float32,
            kernel_init=dense_init("embed", "expert"), name="router",
        )
        logits = router(x.astype(jnp.float32)).reshape(tokens, e)
        probs = jax.nn.softmax(logits, axis=-1)
        expert_idx = jnp.argmax(probs, axis=-1)                     # (T,)
        gate = jnp.max(probs, axis=-1)                              # (T,)

        # Position of each token within its expert's capacity buffer.
        onehot = jax.nn.one_hot(expert_idx, e, dtype=jnp.int32)     # (T,E)
        pos_in_expert = jnp.cumsum(onehot, axis=0) * onehot         # 1-based
        pos = jnp.sum(pos_in_expert, axis=-1) - 1                   # (T,)
        keep = pos < capacity
        disp = jnp.einsum(
            "te,tc->tec",
            jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)
            * keep[:, None].astype(jnp.float32),
            jax.nn.one_hot(jnp.where(keep, pos, 0), capacity, dtype=jnp.float32),
        )                                                            # (T,E,C)

        xt = x.reshape(tokens, d)
        expert_in = jnp.einsum("tec,td->ecd", disp, xt.astype(jnp.float32)).astype(dt)

        w_gate = self.param(
            "w_gate", dense_init("expert", "embed", "mlp"), (e, d, self.hidden), dt
        )
        w_up = self.param(
            "w_up", dense_init("expert", "embed", "mlp"), (e, d, self.hidden), dt
        )
        w_down = self.param(
            "w_down", dense_init("expert", "mlp", "embed"), (e, self.hidden, d), dt
        )
        h = nn.silu(jnp.einsum("ecd,edh->ech", expert_in, w_gate)) * jnp.einsum(
            "ecd,edh->ech", expert_in, w_up
        )
        expert_out = jnp.einsum("ech,ehd->ecd", h, w_down)

        combined = jnp.einsum(
            "tec,ecd->td", disp, expert_out.astype(jnp.float32)
        ) * gate[:, None]
        # Auxiliary load-balancing loss (Switch): stored for the train step.
        density = jnp.mean(onehot.astype(jnp.float32), axis=0)
        router_prob = jnp.mean(probs, axis=0)
        aux = e * jnp.sum(density * router_prob)
        self.sow("losses", "moe_aux", aux)
        return combined.reshape(b, s, d).astype(x.dtype)
