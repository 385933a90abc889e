"""Batched on-TPU text embedders.

Replaces the reference's Supermemory cloud embedding/index service
(reference: backend/app/pipeline/supermemory_ingest.py:53-79) with two
on-device backends sharing one interface:

* HashNGramEmbedder (default): hashed word n-gram counts (host featurize,
  stable blake2 hashes) -> log scaling -> seeded random-sign projection
  (one bf16 MXU matmul) -> L2 norm.  Fully deterministic, training-free,
  and gives real lexical-semantic retrieval out of the box.
* NeuralEmbedder: byte-level transformer encoder with masked mean pooling;
  same interface, random-init until trained (train/), intended as the
  learned upgrade path.

Both emit unit-norm vectors, so the index's dot product (ops/topk.py) is
cosine similarity.
"""

from __future__ import annotations

import functools
import hashlib
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .configs import EmbedderConfig
from .layers import RMSNorm, _dtype, dense_init
from .tokenizer import ByteTokenizer
from .vit import EncoderBlock

_WORD_RE = re.compile(r"[a-z0-9]+")


def _stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


class HashNGramEmbedder:
    def __init__(self, cfg: Optional[EmbedderConfig] = None, seed: int = 0):
        self.cfg = cfg or EmbedderConfig()
        self.dim = self.cfg.dim
        self.seed = seed

    def _featurize(self, text: str) -> np.ndarray:
        counts = np.zeros((self.cfg.ngram_buckets,), np.float32)
        words = _WORD_RE.findall(text.lower())
        for n in self.cfg.ngrams:
            for i in range(len(words) - n + 1):
                gram = " ".join(words[i : i + n])
                counts[_stable_hash(gram) % self.cfg.ngram_buckets] += 1.0
        return counts

    @functools.cached_property
    def _project(self):
        buckets, dim, seed = self.cfg.ngram_buckets, self.dim, self.seed

        @jax.jit
        def run(counts):
            proj = jax.random.rademacher(
                jax.random.PRNGKey(seed), (buckets, dim), jnp.bfloat16
            )
            x = jnp.log1p(counts)
            emb = jnp.einsum(
                "bn,nd->bd", x.astype(jnp.bfloat16), proj,
                preferred_element_type=jnp.float32,
            )
            norm = jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return emb / jnp.maximum(norm, 1e-6)

        return run

    def embed(self, texts: List[str]) -> np.ndarray:
        counts = np.stack([self._featurize(t) for t in texts])
        return np.asarray(self._project(jnp.asarray(counts)))


class NeuralEmbedderModule(nn.Module):
    cfg: EmbedderConfig

    @nn.compact
    def __call__(self, ids: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg.dtype)
        from .tokenizer import VOCAB_SIZE

        x = nn.Embed(
            VOCAB_SIZE, cfg.dim, dtype=dt,
            embedding_init=nn.with_partitioning(
                nn.initializers.normal(stddev=0.02), ("vocab", "embed")
            ),
        )(ids)
        pos = self.param(
            "pos_embed",
            nn.with_partitioning(nn.initializers.normal(stddev=0.02), (None, None)),
            (cfg.max_seq, cfg.dim),
        )
        x = x + pos[: ids.shape[1]].astype(dt)[None]
        for i in range(cfg.depth):
            x = EncoderBlock(
                dim=cfg.dim, heads=cfg.heads, dtype=cfg.dtype, name=f"block_{i}"
            )(x, kv_len=lengths)
        x = RMSNorm(name="norm")(x)
        mask = (
            jnp.arange(ids.shape[1])[None, :] < lengths[:, None]
        ).astype(jnp.float32)[..., None]
        pooled = jnp.sum(x.astype(jnp.float32) * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1.0
        )
        emb = nn.Dense(
            cfg.dim, use_bias=False, dtype=jnp.float32,
            kernel_init=dense_init("embed", "embed_out"), name="out",
        )(pooled)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)


class NeuralEmbedder:
    def __init__(self, cfg: Optional[EmbedderConfig] = None, params=None, seed: int = 0):
        self.cfg = cfg or EmbedderConfig()
        self.dim = self.cfg.dim
        self.model = NeuralEmbedderModule(self.cfg)
        self.tok = ByteTokenizer()
        if params is None:
            dummy = jnp.zeros((1, 8), jnp.int32)
            params = self.model.init(
                jax.random.PRNGKey(seed), dummy, jnp.ones((1,), jnp.int32)
            )["params"]
            params = nn.meta.unbox(params)
        self.params = params

    @functools.cached_property
    def _run(self):
        @jax.jit
        def run(params, ids, lengths):
            return self.model.apply({"params": params}, ids, lengths)

        return run

    def embed(self, texts: List[str]) -> np.ndarray:
        max_len = min(
            self.cfg.max_seq,
            max(8, -(-max(len(t.encode()) for t in texts) // 128) * 128),
        )
        ids, lens = self.tok.encode_batch(texts, max_len)
        return np.asarray(self._run(self.params, jnp.asarray(ids), jnp.asarray(lens)))


def get_embedder(
    backend: str = "hash", cfg: Optional[EmbedderConfig] = None, seed: int = 0
):
    if backend == "hash":
        return HashNGramEmbedder(cfg, seed=seed)
    if backend == "neural":
        return NeuralEmbedder(cfg, seed=seed)
    raise ValueError(f"unknown embedder backend {backend!r}")
