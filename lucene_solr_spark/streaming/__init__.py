from .incremental import IncrementalIndexer, compact_segments  # noqa: F401
