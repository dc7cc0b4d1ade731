"""RangeField relation queries: INTERSECTS / WITHIN / CONTAINS / CROSSES.

Reference: ``lucene/core/src/java/org/apache/lucene/document/
RangeFieldQuery.java`` — each document stores an n-dimensional range
(min[], max[] per ``IntRange.java:54-78``) and a query range matches by
one of four relations, evaluated per dimension and AND-ed across
dimensions (``matches`` at :62-156):

- INTERSECTS (:103-110): ``q.max >= d.min AND q.min <= d.max``
- WITHIN     (:135-142): doc range inside the query —
  ``q.min <= d.min AND q.max >= d.max``
- CONTAINS   (:167-174): doc range contains the query —
  ``d.min <= q.min AND d.max >= q.max``
- CROSSES    (:190-194): ``INTERSECTS AND NOT WITHIN`` (overlaps the
  query but is not fully inside it).

The reference evaluates these against a BKD tree with pruning via the
``compare`` node tests; here every predicate is a plain Catalyst
conjunction over (min, max) columns — whole-stage codegen'd, pushed to
the Parquet scan where sargable (the single-sided bounds are), and the
BKD inner-node pruning role is played by row-group min/max statistics.
No shuffle, no UDF.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .suite import load_table, register

RELATIONS = ("intersects", "within", "contains", "crosses")


def range_relation_predicate(
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
) -> Column:
    """Build the boolean Column for one relation.

    ``dims`` = [(min_col, max_col), ...] per dimension; ``query`` the
    matching [(qmin, qmax), ...]. Both ends inclusive, exactly like the
    packed byte comparisons in RangeFieldQuery.QueryType.matches.
    """
    if len(dims) != len(query):
        raise ValueError(f"{len(dims)} dims vs {len(query)} query ranges")
    if relation not in RELATIONS:
        raise ValueError(f"relation must be one of {RELATIONS}")

    def per_dim(rel: str) -> Column:
        pred = F.lit(True)
        for (mn, mx), (qmin, qmax) in zip(dims, query):
            dmin, dmax = F.col(mn), F.col(mx)
            if rel == "intersects":
                p = (F.lit(qmax) >= dmin) & (F.lit(qmin) <= dmax)
            elif rel == "within":
                p = (F.lit(qmin) <= dmin) & (F.lit(qmax) >= dmax)
            else:  # contains
                p = (dmin <= F.lit(qmin)) & (dmax >= F.lit(qmax))
            pred = pred & p
        return pred

    if relation == "crosses":
        # RangeFieldQuery.java:190-194: intersects && !within
        return per_dim("intersects") & ~per_dim("within")
    return per_dim(relation)


def range_field_query(
    df: DataFrame,
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
) -> DataFrame:
    """newIntersectsQuery / newWithinQuery / newContainsQuery /
    newCrossesQuery (IntRange.java:185-221): filter rows whose stored
    n-dim range stands in ``relation`` to the query range."""
    return df.where(range_relation_predicate(dims, query, relation))


def range_relation_counts(
    df: DataFrame,
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    checksum_col: str,
) -> DataFrame:
    """All four relations in ONE scan: conditional aggregation emitting
    (relation, n, checksum) — the per-relation hit count plus a value
    checksum so an oracle comparison pins membership, not just size."""
    aggs = []
    for rel in RELATIONS:
        p = range_relation_predicate(dims, query, rel)
        aggs.append(F.sum(F.when(p, 1).otherwise(0)).alias(f"n_{rel}"))
        aggs.append(F.sum(F.when(p, F.col(checksum_col)).otherwise(0))
                    .alias(f"sum_{rel}"))
    wide = df.agg(*aggs)
    pieces = [
        wide.select(F.lit(rel).alias("relation"),
                    F.col(f"n_{rel}").alias("n"),
                    F.col(f"sum_{rel}").alias("key_sum"))
        for rel in RELATIONS
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")


# ---------------------------------------------------------------------------
# Driver row: 2-dimensional ranges derived from lineitem. Each line
# item stores range A = [l_quantity, l_quantity + l_linenumber] and
# range B = [l_partkey % 50, l_partkey % 50 + l_suppkey % 20]; the
# query box is A:[15,35] × B:[10,40]. The oracle SQL below is written
# straight from RangeFieldQuery.java's comparisons (not generated from
# the Spark predicate builder) so the two derivations are independent.
# ---------------------------------------------------------------------------

_Q = ((15, 35), (10, 40))

_RANGES_CTE = """
WITH r AS (
  SELECT l_orderkey AS key,
         l_quantity AS amin, l_quantity + l_linenumber AS amax,
         l_partkey % 50 AS bmin, l_partkey % 50 + l_suppkey % 20 AS bmax
  FROM lineitem
)
"""

_PRED = {
    "intersects": ("35 >= amin AND 15 <= amax AND 40 >= bmin "
                   "AND 10 <= bmax"),
    "within": "15 <= amin AND 35 >= amax AND 10 <= bmin AND 40 >= bmax",
    "contains": "amin <= 15 AND amax >= 35 AND bmin <= 10 AND bmax >= 40",
}
_PRED["crosses"] = (f"({_PRED['intersects']}) "
                    f"AND NOT ({_PRED['within']})")

_RANGES_ORACLE = _RANGES_CTE + "\nUNION ALL\n".join(
    f"SELECT '{rel}' AS relation, "
    f"count(CASE WHEN {_PRED[rel]} THEN 1 END) AS n, "
    f"CAST(coalesce(sum(CASE WHEN {_PRED[rel]} THEN key ELSE 0 END), 0) "
    f"AS BIGINT) AS key_sum FROM r"
    for rel in RELATIONS
) + "\nORDER BY relation"


@register("range_field_relations", _RANGES_ORACLE)
def range_field_relations(spark, sf_dir):
    """IntRange-style 2-dim range storage queried under all four
    RangeFieldQuery relations in one scan (document/RangeFieldQuery.java
    QueryType matrix; IntRange.java:185-221 factory surface)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.select(
        F.col("l_orderkey").alias("key"),
        F.col("l_quantity").alias("amin"),
        (F.col("l_quantity") + F.col("l_linenumber")).alias("amax"),
        (F.col("l_partkey") % 50).alias("bmin"),
        ((F.col("l_partkey") % 50) + (F.col("l_suppkey") % 20))
        .alias("bmax"),
    )
    return range_relation_counts(
        r, [("amin", "amax"), ("bmin", "bmax")], list(_Q), "key")
