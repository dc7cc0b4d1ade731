"""Global-ordinals join (lucene/join's GlobalOrdinalsQuery +
OrdinalMap, join/GlobalOrdinalsQuery.java, index/OrdinalMap.java).

Lucene's trick: join VALUES (arbitrary bytes) map once per reader to
dense global ordinals, and every join/aggregation after that runs on
small ints — the OrdinalMap is built once and reused across queries.
The Spark rendering keeps both properties:

* ``OrdinalMap`` builds the dense ordinal dictionary from the dim
  side's distinct keys ONCE, persists it, and broadcasts it into every
  encode — the per-reader cached map.
* ``ordinal_join`` dictionary-encodes both sides and joins on the
  int ordinal. At scale this shrinks shuffle/probe bytes for long
  string keys (repo/path/commit-style keys in the north-rule corpus)
  and keys the exchange on a dense int domain.

The same design carries the query engine's hot path: the batched BM25
scan joins clauses to postings on int64 ``xxhash64(field, term)`` keys
instead of strings (search/executor.py), with a collision guard —
terms are dictionary-encoded once at index time, queries join on ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


class OrdinalMap:
    """Dense key -> ordinal dictionary built once from the (small) dim
    side, reused across joins (index/OrdinalMap.java role: "map native
    ords to global ords", cached per reader).

    The global row_number window is bounded by the DIM side's distinct
    keys — the same memory contract as Lucene's OrdinalMap, which
    materializes per-segment ordinal deltas in heap."""

    def __init__(self, dim: DataFrame, key: str):
        self.key = key
        self.dict = (
            dim.select(key).where(F.col(key).isNotNull()).distinct()
            .withColumn("_gord",
                        F.row_number().over(Window.orderBy(key)) - 1)
        ).persist()
        self.dict.count()  # materialize once (build-the-map step)

    def encode(self, df: DataFrame, how: str = "inner") -> DataFrame:
        """Attach the ``_gord`` ordinal column; ``how='left'`` keeps
        rows whose key has no ordinal (null _gord, the -1 "missing
        ordinal" role)."""
        return df.join(F.broadcast(self.dict), self.key, how)

    def unpersist(self):
        self.dict.unpersist()


def ordinal_join(fact: DataFrame, dim: DataFrame, key: str,
                 how: str = "inner",
                 omap: OrdinalMap | None = None) -> DataFrame:
    """Join fact<->dim on ``key`` THROUGH dense global ordinals:
    both sides encode against the shared OrdinalMap (broadcast), the
    join itself runs on the int ``_gord``. Semantics identical to
    ``fact.join(dim, key, how)`` for inner/left joins on a unique-key
    dim; pass a prebuilt ``omap`` to amortize the map across many
    joins (the cached-per-reader contract)."""
    m = omap or OrdinalMap(dim, key)
    f_enc = m.encode(fact, "left" if how == "left" else "inner")
    d_enc = m.encode(dim).drop(key)
    out = f_enc.join(d_enc, "_gord", how).drop("_gord")
    return out
