"""Iceberg table-layout adapter (index/iceberg.py): the accessor-seam
contract in-container (no Iceberg runtime ships here), and the full
publish→search e2e wherever an Iceberg catalog IS configured."""

import numpy as np
import pytest

from lucene_solr_spark.index.iceberg import (
    INDEX_TABLES,
    IcebergSegmentIndex,
    iceberg_available,
    publish_index,
)
from lucene_solr_spark.index.segments import SegmentIndex
from lucene_solr_spark.search.wand import SegmentSearcher


def test_not_available_in_container(spark):
    assert iceberg_available(spark) is False


def test_accessor_surface_matches_segment_index():
    """IcebergSegmentIndex must expose every accessor SegmentSearcher
    touches on SegmentIndex — the drop-in contract."""
    needed = ["blocks", "summaries", "docmap", "docs", "dict", "stats",
              "deletes", "deleted_docids", "manifest"]
    for name in needed:
        assert callable(getattr(IcebergSegmentIndex, name, None)), name
        assert callable(getattr(SegmentIndex, name, None)), name
    assert set(INDEX_TABLES) == {"blocks", "docmap", "docs", "dict",
                                 "stats"}


import os


@pytest.mark.skipif(
    os.environ.get("LSS_ICEBERG") != "1",
    reason="needs an Iceberg-configured Spark session "
           "(spark.sql.catalog.iceberg=... + iceberg-spark jar); "
           "set LSS_ICEBERG=1 there")
def test_publish_and_search_e2e(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import corpus_df
    from lucene_solr_spark.index.segments import build_segment_index
    from lucene_solr_spark.search.queries import TermQuery

    root = str(tmp_path_factory.mktemp("iceidx"))
    idx = build_segment_index(corpus_df(spark, 200, partitions=4), root,
                              docs_per_segment=64)
    publish_index(idx, "lss_test")
    ice = IcebergSegmentIndex("lss_test", spark)
    a = SegmentSearcher(idx, cache=True)
    b = SegmentSearcher(ice, cache=True)
    qa = a.search(TermQuery("return"), 10)
    qb = b.search(TermQuery("return"), 10)
    assert [(d.docid, np.float32(d.score)) for d in qa] == [
        (d.docid, np.float32(d.score)) for d in qb]
