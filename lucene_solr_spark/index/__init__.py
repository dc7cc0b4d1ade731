from .builder import IndexTables, assign_docids, build_index  # noqa: F401
