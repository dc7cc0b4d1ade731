"""Master/replica replication (ReplicationHandler + IndexFetcher
roles): a replica pulled from a commit point serves bit-identical
results, incremental fetches are differential (only new files move),
an in-sync replica is a no-op, and a killed fetch never corrupts the
serving replica."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.index import (
    SegmentIndex,
    create_snapshot,
    fetch_index,
    publish_file_list,
    replication_details,
)
from lucene_solr_spark.search.queries import TermQuery
from lucene_solr_spark.search.wand import SegmentSearcher

N_DOCS = 96


@pytest.fixture()
def master(spark, tmp_path):
    from lucene_solr_spark.streaming import IncrementalIndexer

    root = str(tmp_path / "master")
    indexer = IncrementalIndexer(root, stop_words=ENGLISH_STOP_WORDS,
                                 docs_per_segment=24)
    indexer.process_batch(corpus_df(spark, N_DOCS, partitions=3), 0)
    return indexer, SegmentIndex(root, spark)


def _topk(idx, term, k=10):
    return [(h.docid, np.float32(h.score))
            for h in SegmentSearcher(idx).search(TermQuery(term), k)]


def test_replica_serves_identical_results(spark, master, tmp_path):
    indexer, idx = master
    gen = create_snapshot(idx, "publish")
    term = idx.dict().orderBy(F.desc("df"), "term").first()["term"]
    want = _topk(idx, term)

    replica_root = str(tmp_path / "replica")
    res = fetch_index(indexer.root, replica_root)
    assert res["status"] == "success" and res["generation"] == gen
    assert res["files_fetched"] > 0 and res["files_skipped"] == 0

    replica = SegmentIndex(replica_root, spark)
    assert _topk(replica, term) == want
    assert replica.stats()["doc_count"] == N_DOCS

    d = replication_details(indexer.root, replica_root)
    assert d["master"]["replicable_generation"] == gen
    assert d["replica"]["generation"] == gen


def test_already_in_sync_is_noop(spark, master, tmp_path):
    indexer, idx = master
    create_snapshot(idx)
    replica_root = str(tmp_path / "replica")
    fetch_index(indexer.root, replica_root)
    mtime = os.path.getmtime(replica_root)
    res = fetch_index(indexer.root, replica_root)
    assert res["status"] == "already_in_sync"
    assert res["files_fetched"] == 0 and res["files_skipped"] == 0
    assert os.path.getmtime(replica_root) == mtime


def test_incremental_fetch_is_differential(spark, master, tmp_path):
    """After the master ingests another batch and republishes, the
    second fetch moves only new/changed files; unchanged segment
    parquet is reused via hardlink (IndexFetcher.java:1019-1026) —
    and the updated replica matches the updated master."""
    indexer, idx = master
    create_snapshot(idx)
    replica_root = str(tmp_path / "replica")
    first = fetch_index(indexer.root, replica_root)

    extra = corpus_df(spark, 24, partitions=2).withColumn(
        "path", F.concat(F.col("path"), F.lit(".v2")))
    indexer.process_batch(extra, 1)
    gen2 = create_snapshot(idx, "after batch 1")
    res = fetch_index(indexer.root, replica_root)
    assert res["status"] == "success" and res["generation"] == gen2
    assert res["files_skipped"] > 0  # old segments reused, not re-sent
    assert res["files_fetched"] > 0  # the new batch's files moved
    assert res["bytes_skipped"] > 0
    # reused files share inodes with the previous replica install only
    # transiently (old tree is dropped); verify content identity the
    # strong way instead: replica == master, including the new docs
    replica = SegmentIndex(replica_root, spark)
    assert replica.stats()["doc_count"] == N_DOCS + 24
    term = idx.dict().orderBy(F.desc("df"), "term").first()["term"]
    assert _topk(replica, term) == _topk(idx, term)
    assert first["files_fetched"] >= res["files_fetched"]


def test_killed_fetch_leaves_replica_serving(spark, master, tmp_path):
    """A stale staging dir (killed fetch) is discarded; the live
    replica keeps serving the old generation until a fetch completes
    atomically (tmp + rename, IndexFetcher's index.tmp staging)."""
    indexer, idx = master
    gen1 = create_snapshot(idx)
    replica_root = str(tmp_path / "replica")
    fetch_index(indexer.root, replica_root)

    extra = corpus_df(spark, 24, partitions=2).withColumn(
        "path", F.concat(F.col("path"), F.lit(".v3")))
    indexer.process_batch(extra, 1)
    gen2 = create_snapshot(idx)

    # simulate a fetch killed mid-stage: partial tmp dir exists
    stale = replica_root + f".fetch-tmp-gen{gen2}"
    os.makedirs(os.path.join(stale, "blocks"))
    with open(os.path.join(stale, "blocks", "junk.parquet"), "w") as f:
        f.write("partial garbage")
    # replica still serves gen1
    st = replication_details(replica_root=replica_root)["replica"]
    assert st["generation"] == gen1
    assert SegmentIndex(replica_root, spark).stats()["doc_count"] == N_DOCS

    res = fetch_index(indexer.root, replica_root)
    assert res["status"] == "success" and res["generation"] == gen2
    assert not os.path.exists(stale)
    assert SegmentIndex(replica_root, spark).stats()[
        "doc_count"] == N_DOCS + 24


def test_file_list_is_checksummed(master):
    indexer, idx = master
    gen = create_snapshot(idx)
    listing = publish_file_list(indexer.root, gen)
    assert listing["generation"] == gen
    names = [f["name"] for f in listing["files"]]
    assert "manifest.json" in names
    assert any(n.endswith(".parquet") for n in names)
    for f in listing["files"]:
        assert f["size"] >= 0 and isinstance(f["checksum"], int)
    # no commit point → explicit error, never silent live-tree ship
    with pytest.raises(FileNotFoundError):
        publish_file_list(indexer.root, gen + 999)
