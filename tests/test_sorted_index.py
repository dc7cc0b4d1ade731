"""Index sorting + early-terminated sorted top-k (index/sorted.py;
IndexWriterConfig.setIndexSort / Sorter.java / TopFieldCollector.java:71-121
semantics)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.sorted import (
    SortedIndex,
    build_sorted_index,
    sorted_topk,
)


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sorted_idx"))
    # 240 rows, deliberately shuffled insert order, duplicate sort
    # values (ties broken by doc_id), one rare category.
    rows = [
        (doc_id, (doc_id * 37) % 60, "rare" if doc_id % 50 == 7 else "common")
        for doc_id in range(240)
    ]
    df = spark.createDataFrame(rows, "doc_id long, size long, cat string")
    m = build_sorted_index(df, root, "size", num_segments=6)
    assert len(m["segments"]) >= 4
    return SortedIndex(root, spark)


def _oracle(spark, sidx, k, descending=False, where=None):
    full = spark.read.parquet(sidx.root + "/data").drop("seg")
    if where is not None:
        full = full.where(where)
    order = [F.desc("size"), F.desc("doc_id")] if descending else [
        F.asc("size"), F.asc("doc_id")]
    return [(r["doc_id"], r["size"]) for r in
            full.orderBy(*order).limit(k).collect()]


def test_segments_are_range_disjoint(sidx):
    segs = sidx.manifest["segments"]
    for a, b in zip(segs, segs[1:]):
        assert a["max"] <= b["min"]
    assert sum(s["count"] for s in segs) == 240


def test_unfiltered_topk_scans_one_segment(spark, sidx):
    df, stats = sorted_topk(sidx, 10)
    assert stats["early_terminated"] and stats["segments_scanned"] == 1
    got = [(r["doc_id"], r["size"]) for r in df.collect()]
    assert got == _oracle(spark, sidx, 10)


def test_descending_walks_tail_segments(spark, sidx):
    df, stats = sorted_topk(sidx, 10, descending=True)
    assert stats["early_terminated"]
    assert stats["segments_scanned"] < stats["segments_total"]
    got = [(r["doc_id"], r["size"]) for r in df.collect()]
    assert got == _oracle(spark, sidx, 10, descending=True)


def test_filtered_topk_early_terminates_correctly(spark, sidx):
    where = F.col("cat") == "rare"          # ~5 of 240 rows
    df, stats = sorted_topk(sidx, 3, filter_expr=where)
    assert stats["early_terminated"]
    got = [(r["doc_id"], r["size"]) for r in df.collect()]
    assert got == _oracle(spark, sidx, 3, where=where)


def test_filter_rarer_than_k_scans_everything_still_correct(spark, sidx):
    where = F.col("cat") == "rare"
    df, stats = sorted_topk(sidx, 100, filter_expr=where)
    assert stats["segments_scanned"] == stats["segments_total"]
    got = [(r["doc_id"], r["size"]) for r in df.collect()]
    assert got == _oracle(spark, sidx, 100, where=where)


def test_mismatched_sort_falls_back_to_full_scan(spark, sidx):
    df, stats = sorted_topk(sidx, 5, sort_cols=("doc_id",))
    assert not stats["early_terminated"]
    assert stats["segments_scanned"] == stats["segments_total"]
    # canEarlyTerminate=false path: full scan, requested sort honored
    got = [r["doc_id"] for r in df.collect()]
    assert got == [0, 1, 2, 3, 4]
