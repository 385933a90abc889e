from . import extract, ingest, qa

__all__ = ["extract", "ingest", "qa"]
