from .engine import OracleIndex  # noqa: F401
