"""Commit points / time travel / deletion policy: hardlink-pinned
snapshots (SnapshotDeletionPolicy.java:54-90 + IndexCommit +
DirectoryReader.open(IndexCommit) roles; Iceberg snapshot-id time
travel is the production seam). A snapshot must keep serving the old
index bit-exactly through later ingest, tombstones, and compaction."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.index.segments import (
    SegmentIndex,
    create_snapshot,
    keep_last_n_snapshots,
    list_snapshots,
    open_snapshot,
    release_snapshot,
)
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery
from lucene_solr_spark.search.wand import SegmentSearcher
from lucene_solr_spark.streaming import IncrementalIndexer, compact_segments

N_DOCS = 96


@pytest.fixture()
def indexed(spark, tmp_path):
    root = str(tmp_path / "idx")
    indexer = IncrementalIndexer(root, stop_words=ENGLISH_STOP_WORDS,
                                 docs_per_segment=24)
    indexer.process_batch(corpus_df(spark, N_DOCS, partitions=3), 0)
    return indexer, SegmentIndex(root, spark)


def _common_term(idx):
    return idx.dict().orderBy(F.desc("df"), "term").first()["term"]


def _topk(idx, term, k=10):
    return [(h.docid, np.float32(h.score))
            for h in SegmentSearcher(idx).search(TermQuery(term), k)]


def test_snapshot_survives_ingest_delete_compact(spark, indexed):
    indexer, idx = indexed
    term = _common_term(idx)
    before = _topk(idx, term)
    before_docs = idx.docs().count()
    gen = create_snapshot(idx, note="pre-mutation")

    # mutate the live index: delete the top hit, ingest a new batch,
    # then compact (rewrites segment dirs + docmap + derived tables)
    victim = before[0][0]
    keys = idx.docmap().where(F.col("docid") == victim).select(
        "repo", "path").collect()
    assert indexer.delete_by_key(spark, spark.createDataFrame(keys)) >= 1
    extra = corpus_df(spark, 24, partitions=2).withColumn(
        "path", F.concat(F.col("path"), F.lit(".v2")))
    indexer.process_batch(extra, 1)
    compact_segments(idx, apply_deletes=True)

    live = _topk(idx, term)
    assert victim not in [d for d, _ in live]  # live moved on

    snap = open_snapshot(indexer.root, spark, gen)
    assert _topk(snap, term) == before  # bit-exact time travel
    assert snap.docs().count() == before_docs
    assert snap.stats()["doc_count"] == N_DOCS
    # boolean over the snapshot still runs the full engine
    other = snap.dict().orderBy("df", "term").first()["term"]
    q = BooleanQuery.of(must=[TermQuery(term)], should=[TermQuery(other)])
    assert SegmentSearcher(snap).search(q, 5)


def test_deletion_policy_keep_last_n(spark, indexed):
    _indexer, idx = indexed
    g1 = create_snapshot(idx, "a")
    g2 = create_snapshot(idx, "b")
    g3 = create_snapshot(idx, "c")
    assert [s["gen"] for s in list_snapshots(idx.root)] == [g1, g2, g3]
    released = keep_last_n_snapshots(idx.root, 1)
    assert released == [g1, g2]
    assert [s["gen"] for s in list_snapshots(idx.root)] == [g3]
    release_snapshot(idx.root, g3)
    assert list_snapshots(idx.root) == []
    with pytest.raises(FileNotFoundError):
        open_snapshot(idx.root, spark, g3)


def test_snapshot_is_cheap_hardlinks(spark, indexed):
    """The pin is directory entries, not copied data: every parquet
    file in the snapshot shares its inode with the live tree."""
    import os

    _indexer, idx = indexed
    gen = create_snapshot(idx)
    snap_root = os.path.join(idx.root, "commits", f"gen-{gen}")
    checked = 0
    for dirpath, _d, files in os.walk(os.path.join(snap_root, "blocks")):
        for fn in files:
            if fn.endswith(".parquet"):
                sp = os.path.join(dirpath, fn)
                lp = os.path.join(idx.root,
                                  os.path.relpath(sp, snap_root))
                assert os.stat(sp).st_ino == os.stat(lp).st_ino
                checked += 1
    assert checked > 0
