"""Multi-vector page index with late-interaction (MaxSim) scoring.

ColPali-style retrieval (cf. PAPERS.md: Visual RAG Toolkit, patch-embedding
reduction, hierarchical patch compression): each page is represented by up
to K vectors (sentence- or region-level) instead of one pooled vector, and
a query set {q_j} scores a page as sum_j max_k <q_j, v_k> — fine-grained
term/region matching that a single pooled vector washes out.

On-device scoring is one einsum over the (N, K, D) row tensor plus masked
max/sum reductions — MXU + VPU work with the same doc_id mask-filter design
as the single-vector index (ops/topk.py).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .vector_index import _new_memory_id

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("k",))
def _maxsim_topk(rows, valid, queries, doc_mask, k: int):
    """rows: (N, K, D); valid: (N, K) bool; queries: (Q, D); doc_mask: (N,).

    Returns (values (k,), indices (k,)) of MaxSim scores
    sum_q max_k <q, v_k> over unmasked pages."""
    sims = jnp.einsum(
        "nkd,qd->nkq", rows.astype(jnp.float32), queries.astype(jnp.float32)
    )
    sims = jnp.where(valid[:, :, None], sims, NEG_INF)
    per_query = jnp.max(sims, axis=1)               # (N, Q)
    scores = jnp.sum(per_query, axis=1)             # (N,)
    scores = jnp.where(doc_mask > 0, scores, NEG_INF)
    return jax.lax.top_k(scores, k)


class MultiVectorIndex:
    """HBM-resident (N, K, D) index; same record/result surface as
    VectorIndex but `add` takes a per-page vector *set* and `search` takes a
    query vector *set* (returning one ranked result list)."""

    def __init__(self, dim: int, vecs_per_page: int = 8, capacity: int = 256):
        self.dim = dim
        self.vecs_per_page = vecs_per_page
        self._rows = jnp.zeros((capacity, vecs_per_page, dim), jnp.float32)
        self._valid = jnp.zeros((capacity, vecs_per_page), bool)
        self.count = 0
        self.metadata: List[Dict] = []
        self._doc_rows: Dict[str, List[int]] = {}
        self._mask_cache: Dict[Optional[str], jnp.ndarray] = {}

    def _ensure_capacity(self, extra: int) -> None:
        cap = self._rows.shape[0]
        if self.count + extra <= cap:
            return
        new_cap = cap
        while new_cap < self.count + extra:
            new_cap *= 2
        self._rows = jnp.pad(
            self._rows, ((0, new_cap - cap), (0, 0), (0, 0))
        )
        self._valid = jnp.pad(self._valid, ((0, new_cap - cap), (0, 0)))
        self._mask_cache.clear()

    def add(
        self,
        vector_sets: Sequence[np.ndarray],
        records: Sequence[Dict],
        memory_ids: Optional[Sequence[str]] = None,
    ) -> List[str]:
        """vector_sets[i]: (k_i, dim) unit-norm vectors for page i (k_i is
        truncated/padded to vecs_per_page)."""
        n = len(vector_sets)
        assert len(records) == n
        if memory_ids is None:
            memory_ids = [_new_memory_id() for _ in range(n)]
        self._ensure_capacity(n)
        kmax = self.vecs_per_page
        block = np.zeros((n, kmax, self.dim), np.float32)
        vmask = np.zeros((n, kmax), bool)
        for i, vecs in enumerate(vector_sets):
            vecs = np.asarray(vecs, np.float32).reshape(-1, self.dim)[:kmax]
            block[i, : len(vecs)] = vecs
            vmask[i, : len(vecs)] = True
        self._rows = jax.lax.dynamic_update_slice(
            self._rows, jnp.asarray(block), (self.count, 0, 0)
        )
        self._valid = jax.lax.dynamic_update_slice(
            self._valid, jnp.asarray(vmask), (self.count, 0)
        )
        ids = []
        for i, (record, mem_id) in enumerate(zip(records, memory_ids)):
            row = self.count + i
            rec = dict(record)
            rec["memory_id"] = mem_id
            self.metadata.append(rec)
            doc = rec.get("doc_id")
            if doc is not None:
                self._doc_rows.setdefault(doc, []).append(row)
            ids.append(mem_id)
        self.count += n
        self._mask_cache.clear()
        return ids

    def _mask_for(self, doc_id: Optional[str]) -> jnp.ndarray:
        if doc_id in self._mask_cache:
            return self._mask_cache[doc_id]
        cap = self._rows.shape[0]
        mask = np.zeros((cap,), np.float32)
        if doc_id is None:
            mask[: self.count] = 1.0
        else:
            mask[self._doc_rows.get(doc_id, [])] = 1.0
        out = jnp.asarray(mask)
        self._mask_cache[doc_id] = out
        return out

    def search(
        self,
        query_vectors: np.ndarray,
        top_k: int = 8,
        doc_id: Optional[str] = None,
    ) -> List[Dict]:
        """query_vectors: (Q, dim) — e.g. the question plus rewrite phrases.
        Returns one ranked result list (same record shape as VectorIndex)."""
        if self.count == 0:
            return []
        queries = np.atleast_2d(np.asarray(query_vectors, np.float32))
        k = min(top_k, self.count)
        vals, idx = _maxsim_topk(
            self._rows, self._valid, jnp.asarray(queries),
            self._mask_for(doc_id), k,
        )
        results = []
        rows_host = None
        for score, row in zip(np.asarray(vals), np.asarray(idx)):
            if score <= NEG_INF / 2:
                continue
            rec = self.metadata[int(row)]
            if rows_host is None:
                rows_host = np.asarray(self._rows[np.asarray(idx)])
                valid_host = np.asarray(self._valid[np.asarray(idx)])
            pos = int(np.where(np.asarray(idx) == row)[0][0])
            results.append(
                {
                    "id": rec["memory_id"],
                    "content": rec.get("content", ""),
                    "metadata": {
                        key: rec[key]
                        for key in rec
                        if key not in ("memory_id", "content")
                    },
                    "score": float(score),
                    "vectors": rows_host[pos][valid_host[pos]],
                }
            )
        return results

    # -- persistence --------------------------------------------------------

    def save(self, path) -> None:
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path / "mv_rows.npz",
            rows=np.asarray(self._rows[: self.count], np.float32),
            valid=np.asarray(self._valid[: self.count]),
        )
        (path / "mv_metadata.json").write_text(
            json.dumps(
                {
                    "dim": self.dim,
                    "vecs_per_page": self.vecs_per_page,
                    "metadata": self.metadata,
                },
                ensure_ascii=False,
            )
        )

    @classmethod
    def load(cls, path) -> "MultiVectorIndex":
        path = Path(path)
        meta = json.loads((path / "mv_metadata.json").read_text())
        with np.load(path / "mv_rows.npz") as data:
            rows, valid = data["rows"], data["valid"]
        index = cls(
            dim=meta["dim"],
            vecs_per_page=meta["vecs_per_page"],
            capacity=max(256, rows.shape[0]),
        )
        if rows.shape[0]:
            sets = [rows[i][valid[i]] for i in range(rows.shape[0])]
            index.add(
                sets,
                [
                    {k: v for k, v in rec.items() if k != "memory_id"}
                    for rec in meta["metadata"]
                ],
                memory_ids=[rec["memory_id"] for rec in meta["metadata"]],
            )
        return index
