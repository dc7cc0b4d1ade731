from .suite import ORACLES, QUERIES, load_table  # noqa: F401
