"""Contrastive training for the neural embedder.

Gives the NeuralEmbedder (models/embedder.py) its learning signal: in-batch
InfoNCE over (query, page) pairs — queries are content-phrase rewrites of a
page's text (the same rewriter serving uses), positives are the page itself,
and every other page in the batch is a negative.  Symmetric loss
(query->page and page->query), temperature-scaled; the standard dual-encoder
recipe, batched on device.
"""

from __future__ import annotations

from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.configs import EmbedderConfig
from ..models.embedder import NeuralEmbedderModule
from ..models.tokenizer import ByteTokenizer
from .data import synthetic_page_text


def info_nce_loss(model, params, batch: Dict, temperature: float = 0.05):
    q = model.apply({"params": params}, batch["q_ids"], batch["q_len"])
    d = model.apply({"params": params}, batch["d_ids"], batch["d_len"])
    logits = (q @ d.T) / temperature            # (B, B)
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_qd + loss_dq) / 2.0


def _distinctive_terms(rng: np.random.Generator, n: int = 3):
    """Rare identifier-like terms that separate pages (documents in the wild
    are separable by their rare terms; the tiny shared synthetic vocabulary
    is not, so we inject them).  Drawn from a wide character pool so even
    shallow encoders get byte-level signal."""
    pool = list("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789#@$%&+=_")
    return ["".join(rng.choice(pool, size=6)) for _ in range(n)]


def make_query(text: str, terms, rng: np.random.Generator) -> str:
    """A lexical 'query' for a page: one of its distinctive terms plus a
    couple of its content words (stand-in for real question logs)."""
    words = text.split()
    picks = [str(rng.choice(terms))]
    if len(words) > 6:
        start = int(rng.integers(0, len(words) - 3))
        picks += words[start : start + 2]
    return " ".join(picks)


def synthetic_pair_batches(
    batch_size: int, max_len: int = 256, seed: int = 0
) -> Iterator[Dict[str, np.ndarray]]:
    tok = ByteTokenizer()
    rng = np.random.default_rng(seed)
    while True:
        docs, queries = [], []
        for _ in range(batch_size):
            terms = _distinctive_terms(rng)
            body = synthetic_page_text(rng, lines=6)
            doc = body + "\nKey terms: " + " ".join(terms) + "."
            docs.append(doc)
            queries.append(make_query(body, terms, rng))
        d_ids, d_len = tok.encode_batch(docs, max_len)
        q_ids, q_len = tok.encode_batch(queries, 64)
        yield {
            "q_ids": q_ids, "q_len": q_len, "d_ids": d_ids, "d_len": d_len,
        }


def make_embedder_train_state(
    cfg: EmbedderConfig, lr: float = 1e-3, seed: int = 0
) -> Tuple:
    model = NeuralEmbedderModule(cfg)
    from flax import linen as nn

    params = nn.meta.unbox(
        model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1,), jnp.int32),
        )["params"]
    )
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    return model, tx, params, opt_state


def embedder_train_step(model, tx, params, opt_state, batch):
    loss, grads = jax.value_and_grad(
        lambda p: info_nce_loss(model, p, batch)
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
