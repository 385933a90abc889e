from .vector_index import VectorIndex
from .store import IndexStore, get_default_store

__all__ = ["VectorIndex", "IndexStore", "get_default_store"]
