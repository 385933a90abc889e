"""Process-wide index store: load-or-create, autosave, one lock for writers.

Plays the role of the Supermemory *service* (persistent, shared across
requests) while VectorIndex is the engine.  The serving layer and CLIs share
one store so ingested documents are immediately queryable
(reference behavior: backend/app/main.py:120-145 ingest then chat).
"""

from __future__ import annotations

import threading
from pathlib import Path
from typing import Optional

from ..config import RUNTIME
from .vector_index import VectorIndex

_lock = threading.Lock()
_default_store: Optional["IndexStore"] = None


class IndexStore:
    def __init__(self, root, dim: int, mode: Optional[str] = None, mesh=None):
        self.root = Path(root)
        self.dim = dim
        self.mode = mode or RUNTIME.retrieval_mode
        self.mesh = mesh  # data-axis mesh: route search through the sharded path
        self._lock = threading.Lock()
        if self.mode == "multi":
            from .multivector import MultiVectorIndex

            if (self.root / "mv_metadata.json").exists():
                self.index = MultiVectorIndex.load(self.root)
                if self.index.dim != dim:
                    self.index = MultiVectorIndex(dim=dim)
            else:
                self.index = MultiVectorIndex(dim=dim)
        elif (self.root / "metadata.json").exists():
            self.index = VectorIndex.load(self.root)
            if self.index.dim != dim:
                # Embedder config changed; start fresh rather than mix spaces.
                self.index = VectorIndex(dim=dim)
        else:
            self.index = VectorIndex(dim=dim)

    def add(self, embeddings, records, memory_ids=None):
        """Single mode: (B, dim) pooled vectors.  Multi mode: a list of
        per-page (k_i, dim) vector sets."""
        with self._lock:
            ids = self.index.add(embeddings, records, memory_ids)
            self.index.save(self.root)
            return ids

    def search(self, query_embeddings, top_k=8, doc_id=None):
        """Single mode: per-query result lists for (B, dim) queries.
        Multi mode: the (Q, dim) input is ONE query set (question +
        rewrites); returns [results] for call-site uniformity.

        With a data-axis mesh attached (serving at scale), single-mode
        queries execute the sharded path: per-shard masked matmul + top-k,
        candidates merged over ICI (parallel/collectives.sharded_cosine_topk)."""
        if self.mode == "multi":
            return [
                self.index.search(query_embeddings, top_k=top_k, doc_id=doc_id)
            ]
        if self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
            return self.index.search_sharded(
                self.mesh, query_embeddings, top_k=top_k, doc_id=doc_id
            )
        return self.index.search(query_embeddings, top_k=top_k, doc_id=doc_id)


def _serving_mesh():
    """Data-only mesh for sharded retrieval when serving spans >1 device.
    VCP_INDEX_SHARDED: '1' force, '0' disable, 'auto' (default) = shard
    whenever more than one device is visible."""
    knob = RUNTIME.index_sharded
    if knob == "0":
        return None
    import jax

    if knob != "1" and len(jax.devices()) < 2:
        return None
    try:
        from ..parallel import MeshConfig, build_mesh

        return build_mesh(MeshConfig(data=len(jax.devices())))
    except Exception:
        return None


def get_default_store(dim: Optional[int] = None, root=None) -> IndexStore:
    global _default_store
    dim = dim or RUNTIME.embed_dim
    root = Path(root or RUNTIME.index_root)
    with _lock:
        if (
            _default_store is None
            or _default_store.root != root
            or _default_store.dim != dim
        ):
            _default_store = IndexStore(root, dim, mesh=_serving_mesh())
        return _default_store
