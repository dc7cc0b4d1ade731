"""addIndexes (IndexWriter.java:2848-2931): fold a separately-built
shard index into a destination with docid/segment renumbering — the
merged index must be BIT-identical (scores + docids) to one index
built over the whole corpus, because the split is a PK-prefix split
and the codec's delta blocks are shift-invariant."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index.segments import (
    SegmentIndex,
    add_indexes,
    append_deletes,
    build_segment_index,
)
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery
from lucene_solr_spark.search.wand import SegmentSearcher

N_DOCS = 200
SPLIT = 120


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory):
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    lo = spark.createDataFrame(pdf.iloc[:SPLIT])
    hi = spark.createDataFrame(pdf.iloc[SPLIT:])
    dst_root = str(tmp_path_factory.mktemp("addidx_dst"))
    src_root = str(tmp_path_factory.mktemp("addidx_src"))
    build_segment_index(lo, dst_root, stop_words=ENGLISH_STOP_WORDS,
                        docs_per_segment=48)
    build_segment_index(hi, src_root, stop_words=ENGLISH_STOP_WORDS,
                        docs_per_segment=32)   # different seg sizing ok
    man = add_indexes(dst_root, src_root, spark)
    searcher = SegmentSearcher(SegmentIndex(dst_root, spark), cache=True)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return man, searcher, oracle, pdf, dst_root


def test_manifest_sums(merged):
    man, searcher, oracle, pdf, _root = merged
    assert man["doc_count"] == N_DOCS
    assert searcher.doc_count == oracle.doc_count == N_DOCS
    assert searcher.sum_ttf == oracle.sum_ttf


def test_merged_is_bit_identical_to_full_build(merged):
    _man, searcher, oracle, _pdf, _root = merged
    by_df = sorted((t for _f, t in oracle.postings),
                   key=lambda t: (oracle.doc_freq(t), t))
    probes = [by_df[0], by_df[len(by_df) // 2], by_df[-1]]
    for t in probes:
        q = TermQuery(t)
        exp = oracle.search(q, 15)
        got = searcher.search(q, 15)
        assert [(d.docid, np.float32(d.score)) for d in got] == [
            (d.docid, np.float32(d.score)) for d in exp], t
    q = BooleanQuery.of(should=[TermQuery(by_df[-1]), TermQuery(by_df[-2])],
                        must_not=[TermQuery(by_df[0])])
    exp = oracle.search(q, 15)
    got = searcher.search(q, 15)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]


def test_src_docids_shifted(merged):
    _man, searcher, _oracle, pdf, _root = merged
    docs = searcher.index.docs().orderBy("docid").collect()
    assert [r["docid"] for r in docs] == list(range(N_DOCS))
    # rows past the split carry the src's metadata at shifted ids
    assert docs[SPLIT]["repo"] == pdf.iloc[SPLIT]["repo"]
    assert docs[SPLIT]["path"] == pdf.iloc[SPLIT]["path"]


def test_deletes_carry_over_shifted(spark, tmp_path_factory):
    pdf = (corpus_pandas(80)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    dst_root = str(tmp_path_factory.mktemp("adddel_dst"))
    src_root = str(tmp_path_factory.mktemp("adddel_src"))
    build_segment_index(spark.createDataFrame(pdf.iloc[:50]), dst_root,
                        stop_words=ENGLISH_STOP_WORDS, docs_per_segment=32)
    build_segment_index(spark.createDataFrame(pdf.iloc[50:]), src_root,
                        stop_words=ENGLISH_STOP_WORDS, docs_per_segment=32)
    append_deletes(src_root, [0, 3])      # src-local docids
    add_indexes(dst_root, src_root, spark)
    idx = SegmentIndex(dst_root, spark)
    assert set(idx.deleted_docids()) == {50, 53}
    s = SegmentSearcher(idx, cache=True)
    live = {r["docid"] for r in
            s.search_df(TermQuery("class"), 10**6).collect()}
    assert not live & {50, 53}


def test_config_mismatch_rejected(spark, tmp_path_factory):
    pdf = corpus_pandas(40).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    a = str(tmp_path_factory.mktemp("cfg_a"))
    b = str(tmp_path_factory.mktemp("cfg_b"))
    build_segment_index(spark.createDataFrame(pdf.iloc[:20]), a,
                        stop_words=ENGLISH_STOP_WORDS)
    build_segment_index(spark.createDataFrame(pdf.iloc[20:]), b,
                        stop_words=frozenset({"xyz"}))
    with pytest.raises(ValueError, match="config mismatch"):
        add_indexes(a, b, spark)
