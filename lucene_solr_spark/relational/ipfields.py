"""Driver row for the InetAddressPoint / InetAddressRange surface.

Deterministic IPv4s are derived from ``events.event_id`` (four octet
expressions), normalized JVM-side to the 32-hex-char form
(``functions/ip.py``), and queried with the full factory surface of
``lucene/misc/.../document/InetAddressPoint.java`` (:201-266 — exact,
CIDR prefix, range, set) plus the four ``InetAddressRange.java``
relations over a stored [addr, /24-broadcast] range. All eight
predicates are evaluated in ONE conditional-aggregation scan (no
shuffle, no UDF); the DuckDB oracle re-derives every predicate with
integer arithmetic — an independent derivation, never sharing the hex
encoding under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.ip import (
    cidr_bounds,
    encode_ip,
    ip_exact,
    ip_normalize_col,
    ip_prefix,
    ip_range,
    ip_range_relation,
    ip_set,
)
from .ranges import RELATIONS
from .suite import load_table, register

# event_id → octets (both engines re-derive independently)
#   o1 = id % 223 + 1, o2 = id*7 % 256, o3 = id*13 % 256, o4 = id*29 % 256
_EXACT_IP = "101.188.20.84"           # event_id 100's address
_SET_IPS = ["2.7.13.29", "3.14.26.58", "4.21.39.87"]   # ids 1, 2, 3

_ORACLE_PRED = {
    "exact": "o1 = 101 AND o2 = 188 AND o3 = 20 AND o4 = 84",
    "prefix8": "o1 = 42",
    "range": "o1 BETWEEN 10 AND 29",
    "set": ("(o1=2 AND o2=7 AND o3=13 AND o4=29) OR "
            "(o1=3 AND o2=14 AND o3=26 AND o4=58) OR "
            "(o1=4 AND o2=21 AND o3=39 AND o4=87)"),
    # stored range [ipnum, ipnum with o4=255] vs query 42.0.0.0/8
    "rel_intersects": "42*16777216 + 16777215 >= dmin AND 42*16777216 <= dmax",
    "rel_within": "42*16777216 <= dmin AND 42*16777216 + 16777215 >= dmax",
    "rel_contains": "dmin <= 42*16777216 AND dmax >= 42*16777216 + 16777215",
}
_ORACLE_PRED["rel_crosses"] = (
    f"({_ORACLE_PRED['rel_intersects']}) AND NOT ({_ORACLE_PRED['rel_within']})")

_QNAMES = ["exact", "prefix8", "range", "set",
           "rel_intersects", "rel_within", "rel_contains", "rel_crosses"]

_IP_ORACLE = """
WITH ips AS (
  SELECT event_id,
         event_id % 223 + 1 AS o1,
         (event_id * 7) % 256 AS o2,
         (event_id * 13) % 256 AS o3,
         (event_id * 29) % 256 AS o4,
         ((event_id % 223 + 1) * 16777216 + ((event_id * 7) % 256) * 65536
          + ((event_id * 13) % 256) * 256 + (event_id * 29) % 256) AS dmin,
         ((event_id % 223 + 1) * 16777216 + ((event_id * 7) % 256) * 65536
          + ((event_id * 13) % 256) * 256 + 255) AS dmax
  FROM events
)
""" + "\nUNION ALL\n".join(
    f"SELECT '{q}' AS qname, "
    f"count(CASE WHEN {_ORACLE_PRED[q]} THEN 1 END) AS n, "
    f"CAST(coalesce(sum(CASE WHEN {_ORACLE_PRED[q]} THEN event_id ELSE 0 END), 0)"
    f" AS BIGINT) AS id_sum FROM ips"
    for q in _QNAMES
) + "\nORDER BY qname"


@register("ip_point_queries", _IP_ORACLE)
def ip_point_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InetAddressPoint exact/prefix/range/set + InetAddressRange
    relation queries, all in one scan over sargable hex-range
    predicates."""
    ev = load_table(spark, sf_dir, "events")
    o1 = (F.col("event_id") % 223 + 1).cast("long")
    o2 = ((F.col("event_id") * 7) % 256).cast("long")
    o3 = ((F.col("event_id") * 13) % 256).cast("long")
    o4 = ((F.col("event_id") * 29) % 256).cast("long")
    dotted = F.concat_ws(".", o1, o2, o3, o4)
    dotted_hi = F.concat_ws(".", o1, o2, o3, F.lit(255))
    base = ev.select(
        "event_id",
        ip_normalize_col(dotted).alias("ip"),
        ip_normalize_col(dotted).alias("ip_min"),
        ip_normalize_col(dotted_hi).alias("ip_max"),
    )

    preds = {
        "exact": ip_exact(F.col("ip"), _EXACT_IP),
        "prefix8": ip_prefix(F.col("ip"), "42.0.0.0", 8),
        "range": ip_range(F.col("ip"), "10.0.0.0", "29.255.255.255"),
        "set": ip_set(F.col("ip"), _SET_IPS),
    }
    for rel in RELATIONS:
        preds[f"rel_{rel}"] = ip_range_relation(
            "ip_min", "ip_max", "42.0.0.0", "42.255.255.255", rel)

    aggs = []
    for q in _QNAMES:
        p = preds[q]
        aggs.append(F.sum(F.when(p, 1).otherwise(0)).alias(f"n_{q}"))
        aggs.append(F.sum(F.when(p, F.col("event_id")).otherwise(0))
                    .alias(f"s_{q}"))
    wide = base.agg(*aggs)
    pieces = [
        wide.select(F.lit(q).alias("qname"),
                    F.col(f"n_{q}").cast("long").alias("n"),
                    F.coalesce(F.col(f"s_{q}"), F.lit(0)).cast("long")
                    .alias("id_sum"))
        for q in _QNAMES
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("qname")


__all__ = [
    "ip_point_queries",
    "encode_ip",
    "cidr_bounds",
]
