"""Causal LM decoder (RMSNorm + RoPE + GQA + SwiGLU / Switch-MoE).

Serves three roles the reference delegated to Gemini
(reference: backend/app/pipeline/pdf_extract.py:146-166, qa.py:189-217):
structured page-JSON emission conditioned on vision tokens, evidence-pack
answer generation, and (via models/embedder.py) text encoding.  Sequence
processing uses the Pallas flash kernel; token-by-token decode carries an
explicit KV-cache pytree so generation is a jitted lax.while_loop, not a
Python loop.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .configs import DecoderConfig
from .layers import Attention, RMSNorm, SwiGLU, SwitchMoE, _dtype, dense_init


class DecoderBlock(nn.Module):
    cfg: DecoderConfig
    use_moe: bool = False

    def setup(self):
        cfg = self.cfg
        self.norm1 = RMSNorm()
        self.attn = Attention(
            heads=cfg.heads,
            kv_heads=cfg.kv_heads,
            head_dim=cfg.head_dim,
            out_dim=cfg.dim,
            causal=True,
            rope=True,
            rope_theta=cfg.rope_theta,
            max_seq=cfg.max_seq,
            dtype=cfg.dtype,
        )
        self.norm2 = RMSNorm()
        if self.use_moe:
            self.mlp = SwitchMoE(
                num_experts=cfg.num_experts,
                hidden=cfg.mlp_dim,
                capacity_factor=cfg.capacity_factor,
                dtype=cfg.dtype,
            )
        else:
            self.mlp = SwiGLU(hidden=cfg.mlp_dim, dtype=cfg.dtype)

    def __call__(self, x, kv_len=None):
        x = x + self.attn(self.norm1(x), kv_len=kv_len)
        return x + self.mlp(self.norm2(x))

    def prefill(self, x, kv_len=None, cache_len=None):
        h, cache = self.attn.prefill(self.norm1(x), kv_len=kv_len, cache_len=cache_len)
        x = x + h
        return x + self.mlp(self.norm2(x)), cache

    def decode(self, x, cache, pos):
        h, cache = self.attn.decode(self.norm1(x), cache, pos)
        x = x + h
        return x + self.mlp(self.norm2(x)), cache


class Decoder(nn.Module):
    cfg: DecoderConfig

    def setup(self):
        cfg = self.cfg
        self.embed = nn.Embed(
            cfg.vocab,
            cfg.dim,
            dtype=_dtype(cfg.dtype),
            embedding_init=nn.with_partitioning(
                nn.initializers.normal(stddev=0.02), ("vocab", "embed")
            ),
        )
        # nn.remat transforms only __call__ (the full-sequence training
        # forward): backward recomputes per-block activations instead of
        # storing them — at 2k-seq training the stored-activation footprint
        # otherwise exceeds v5e HBM (batch 32 OOM'd at 24.8G/15.75G).
        # prefill/decode (serving) are inherited untransformed.
        RematBlock = nn.remat(DecoderBlock, prevent_cse=False)
        self.blocks = [
            RematBlock(
                cfg,
                use_moe=(
                    cfg.num_experts > 0 and i % max(cfg.expert_every, 1) == 0
                ),
                name=f"block_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm_f = RMSNorm()
        self.unembed = nn.Dense(
            cfg.vocab,
            use_bias=False,
            dtype=jnp.float32,
            kernel_init=dense_init("embed", "vocab"),
        )

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed(ids)

    def hidden_to_logits(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.unembed(self.norm_f(h).astype(jnp.float32))

    def __call__(
        self, x_emb: jnp.ndarray, kv_len: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Full-sequence forward: (B, S, dim) embeddings -> (B, S, vocab)."""
        from ..parallel.sharding import constrain

        h = constrain(x_emb, ("batch", "seq", "embed"))
        for block in self.blocks:
            h = block(h, kv_len=kv_len)
            h = constrain(h, ("batch", "seq", "embed"))
        return self.hidden_to_logits(h)

    def prefill(
        self,
        x_emb: jnp.ndarray,
        kv_len: Optional[jnp.ndarray] = None,
        cache_len: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, List[dict]]:
        """Returns (logits (B,S,vocab), caches padded to cache_len/max_seq)."""
        h = x_emb
        caches = []
        for block in self.blocks:
            h, cache = block.prefill(h, kv_len=kv_len, cache_len=cache_len)
            caches.append(cache)
        return self.hidden_to_logits(h), caches

    def decode_step(
        self, x_emb: jnp.ndarray, caches: List[dict], pos: jnp.ndarray
    ) -> Tuple[jnp.ndarray, List[dict]]:
        """x_emb: (B, 1, dim); pos: (B,).  Returns (logits (B,vocab), caches)."""
        h = x_emb
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            h, cache = block.decode(h, cache, pos)
            new_caches.append(cache)
        return self.hidden_to_logits(h)[:, 0], new_caches


def init_cache(cfg: DecoderConfig, batch: int, dtype=jnp.bfloat16) -> List[dict]:
    """Zero KV caches for `batch` sequences (used when skipping prefill)."""
    return [
        {
            "k": jnp.zeros((batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim), dtype),
            "v": jnp.zeros((batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim), dtype),
        }
        for _ in range(cfg.depth)
    ]
