"""Index sorting + early-terminated sorted top-k.

Lucene lets an index declare a sort order at write time
(``IndexWriterConfig.setIndexSort``; segments are physically reordered
by ``index/Sorter.java:43`` and merged in sorted order by
``index/MultiSorter.java``).  A query whose sort is a prefix of the
index sort can then stop collecting as soon as ``k`` hits are found —
``search/TopFieldCollector.java:71`` (``canEarlyTerminate``) and
``:105-121`` (collect → ``CollectionTerminatedException`` once
``totalHits >= totalHitsThreshold``).  On a sorted index a top-k query
touches a handful of postings blocks instead of every document.

Spark-first rendering — the write path is a *clustered write*:

* ``repartitionByRange(sort_key, tie_key)`` gives range-disjoint
  segments (Spark samples the key distribution, so segment sizes stay
  balanced even on skewed keys — the role of Lucene's merge-time
  ``MultiSorter`` without the merge);
* ``sortWithinPartitions`` orders rows inside each segment — exactly
  the invariant ``Sorter.java`` establishes per leaf;
* a manifest records per-segment ``(min, max, count)`` of the sort
  key — the role of per-segment ``Sort`` metadata in ``SegmentInfo``
  plus the BKD/points min-max that Lucene's
  ``usesIndexSort``-aware collectors consult.

Query-side, :func:`sorted_topk` walks segments in key order and stops
as soon as ``k`` rows are collected — each step is ONE
partition-pruned scan (the ``seg=<i>`` parquet directory), so an
early-terminated query reads ``segments_scanned / num_segments`` of
the data no matter the corpus size.  Because segments are
range-DISJOINT (stronger than Lucene's per-leaf-only ordering), a
DESCENDING query over an ascending index also early-terminates here —
walk the segments in reverse — where Lucene must fall back.

A query whose sort does not match the index sort falls back to a full
scan + global top-k (``canEarlyTerminate == false``), same answer,
no pruning — mirroring ``TopFieldCollector``'s behavior.

At 100 TB this is the Iceberg table ``sort_order()`` + file-level
min/max pruning story: segments = data files, the manifest = Iceberg's
per-file column stats, and the segment walk collapses into an O(1)
metadata-pruned scan planned by the table format.  Unfiltered queries
never scan more segments than ``ceil(k / rows_per_segment) + 1``;
filtered queries scan until ``k`` matches surface, worst-case the
full table (same worst case as Lucene's collector).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["build_sorted_index", "SortedIndex", "sorted_topk"]

_MANIFEST = "sorted_manifest.json"


def build_sorted_index(
    df: DataFrame,
    out_root: str,
    sort_col: str,
    *,
    tie_col: str = "doc_id",
    num_segments: int = 8,
) -> dict:
    """Write ``df`` as a range-clustered sorted index at ``out_root``.

    Index sort = (``sort_col`` asc, ``tie_col`` asc); ``tie_col`` must
    be unique (Lucene's implicit docID tiebreak,
    ``TopFieldCollector.java`` field-then-doc comparator).  Returns the
    manifest dict.
    """
    spark = df.sparkSession
    clustered = (
        df.repartitionByRange(num_segments, F.col(sort_col), F.col(tie_col))
        .sortWithinPartitions(sort_col, tie_col)
        .withColumn("seg", F.spark_partition_id())
    )
    data_dir = os.path.join(out_root, "data")
    clustered.write.mode("overwrite").partitionBy("seg").parquet(data_dir)

    # One aggregate over the written files → per-segment key stats
    # (reading back what was written keeps the stats honest even if a
    # future Spark version changes partition placement).
    stats = (
        spark.read.parquet(data_dir)
        .groupBy("seg")
        .agg(
            F.min(sort_col).alias("min"),
            F.max(sort_col).alias("max"),
            F.count("*").alias("count"),
        )
        .collect()
    )
    manifest = {
        "sort_col": sort_col,
        "tie_col": tie_col,
        "segments": sorted(
            (
                {
                    "seg": int(r["seg"]),
                    "min": r["min"],
                    "max": r["max"],
                    "count": int(r["count"]),
                }
                for r in stats
            ),
            key=lambda s: (s["min"], s["seg"]),
        ),
    }
    os.makedirs(out_root, exist_ok=True)
    tmp = os.path.join(out_root, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_root, _MANIFEST))
    return manifest


class SortedIndex:
    """Handle on a sorted index root written by :func:`build_sorted_index`."""

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        with open(os.path.join(root, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.sort_col: str = self.manifest["sort_col"]
        self.tie_col: str = self.manifest["tie_col"]

    def _segment(self, seg: int) -> DataFrame:
        # Partition-pruned scan: exactly one seg=<i> directory.
        return self.spark.read.parquet(
            os.path.join(self.root, "data", f"seg={seg}")
        )

    def _full(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "data"))


def _can_early_terminate(
    index: SortedIndex, sort_cols: tuple[str, ...]
) -> bool:
    """``TopFieldCollector.canEarlyTerminate`` (:71): the query sort
    must be a prefix of the index sort (here: exactly the index sort,
    since the index sort has two keys and the tie key is unique)."""
    return tuple(sort_cols) in (
        (index.sort_col,),
        (index.sort_col, index.tie_col),
    )


def sorted_topk(
    index: SortedIndex,
    k: int,
    *,
    sort_cols: tuple[str, ...] | None = None,
    descending: bool = False,
    filter_expr=None,
) -> tuple[DataFrame, dict]:
    """Top-``k`` rows by the requested sort, early-terminating on the
    index sort when legal.

    Returns ``(rows_df, stats)`` where ``stats`` reports
    ``early_terminated``, ``segments_scanned`` and ``segments_total``.
    ``rows_df`` carries at most ``k`` rows in final sorted order.
    """
    spark = index.spark
    sort_cols = tuple(sort_cols or (index.sort_col, index.tie_col))
    segs = index.manifest["segments"]
    if not segs:
        empty = index._full().limit(0).drop("seg")
        return empty, {"early_terminated": True, "segments_scanned": 0,
                       "segments_total": 0}
    stats = {
        "early_terminated": False,
        "segments_scanned": len(segs),
        "segments_total": len(segs),
    }

    order = [
        F.col(index.sort_col).desc() if descending else F.col(index.sort_col).asc(),
        F.col(index.tie_col).desc() if descending else F.col(index.tie_col).asc(),
    ]

    if not _can_early_terminate(index, sort_cols):
        # canEarlyTerminate == false → exhaustive collect, global sort
        # on the REQUESTED keys (the collector still honors the query
        # sort, it just cannot stop early).
        req = [F.col(c).desc() if descending else F.col(c).asc()
               for c in sort_cols]
        if index.tie_col not in sort_cols:
            req.append(F.col(index.tie_col).desc() if descending
                       else F.col(index.tie_col).asc())
        full = index._full().drop("seg")
        if filter_expr is not None:
            full = full.where(filter_expr)
        return full.orderBy(*req).limit(k), stats

    # Early-termination walk: segments in key order (reverse for a
    # descending query — legal because segments are range-disjoint).
    # Segments are scanned in geometrically growing batches (1, 2, 4,
    # …) — one Spark job per batch, so the walk issues O(log n) jobs
    # and reads at most ~2× the minimal segment prefix, instead of one
    # job per segment (job-launch latency would otherwise dominate
    # whenever segments are small relative to cluster overhead).
    walk = list(reversed(segs)) if descending else list(segs)

    if filter_expr is None:
        # Metadata-only planning: manifest counts say exactly which
        # segment prefix holds the top k (TopFieldCollector.java:118's
        # totalHits >= totalHitsThreshold, decided without any scan).
        need, cum = 0, 0
        for s in walk:
            need += 1
            cum += s["count"]
            if cum >= k:
                break
        batches = [walk[:need]]
    else:
        batches, i, size = [], 0, 1
        while i < len(walk):
            batches.append(walk[i:i + size])
            i += size
            size *= 2

    collected: list = []
    schema = None
    scanned = 0
    for batch in batches:
        remaining = k - len(collected)
        if remaining <= 0:
            break
        paths = [os.path.join(index.root, "data", f"seg={s['seg']}")
                 for s in batch]
        seg_df = spark.read.parquet(*paths)
        if filter_expr is not None:
            seg_df = seg_df.where(filter_expr)
        rows = seg_df.orderBy(*order).limit(remaining).collect()
        schema = schema or seg_df.schema
        collected.extend(rows)
        scanned += len(batch)
        if len(collected) >= k:
            break

    stats["early_terminated"] = True
    stats["segments_scanned"] = scanned
    out = spark.createDataFrame(collected, schema) if collected else (
        index._segment(walk[0]["seg"]).limit(0)
    )
    return out.orderBy(*order).limit(k), stats
