"""ShardedSearcher: ExactStatsCache bit-identity over split shards,
LocalStatsCache divergence (SURVEY §3.2 distributed search)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_pandas
from lucene_solr_spark.index.segments import build_segment_index, split_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery
from lucene_solr_spark.search.sharded import ShardedSearcher

N_DOCS = 180


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    src = str(tmp_path_factory.mktemp("shard_src"))
    build_segment_index(spark.createDataFrame(pdf), src,
                        stop_words=ENGLISH_STOP_WORDS, docs_per_segment=24)
    roots = [str(tmp_path_factory.mktemp(f"shard_{i}")) for i in range(3)]
    split_index(src, roots, spark)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return roots, oracle, spark


def _probes(oracle):
    by_df = sorted((t for _f, t in oracle.postings),
                   key=lambda t: (oracle.doc_freq(t), t))
    return by_df


def test_exact_stats_bit_identical(sharded):
    roots, oracle, spark = sharded
    s = ShardedSearcher(roots, spark, stats="exact", cache=True)
    assert s.doc_count == oracle.doc_count
    by_df = _probes(oracle)
    queries = [
        TermQuery(by_df[-1]),
        TermQuery(by_df[len(by_df) // 2]),
        BooleanQuery.of(should=[TermQuery(by_df[-1]),
                                TermQuery(by_df[-3])],
                        must_not=[TermQuery(by_df[0])]),
        BooleanQuery.of(must=[TermQuery(by_df[-2])],
                        should=[TermQuery(by_df[len(by_df) // 3])]),
    ]
    for q in queries:
        exp = oracle.search(q, 15)
        got = s.search(q, 15)
        assert [(d.docid, np.float32(d.score)) for d in got] == [
            (d.docid, np.float32(d.score)) for d in exp], q


def test_local_stats_diverges_in_scores(sharded):
    roots, oracle, spark = sharded
    s_local = ShardedSearcher(roots, spark, stats="local")
    by_df = _probes(oracle)
    q = TermQuery(by_df[len(by_df) // 2])
    exp = {d.docid: np.float32(d.score) for d in oracle.search(q, 10**6)}
    got = {d.docid: np.float32(d.score)
           for d in s_local.search(q, len(exp) + 10)}
    # membership is stats-independent...
    assert set(got) == set(exp)
    # ...but per-shard idf/avgdl make at least one score differ
    assert any(got[d] != exp[d] for d in got)


def test_unknown_stats_mode(sharded):
    roots, _oracle, spark = sharded
    with pytest.raises(ValueError):
        ShardedSearcher(roots, spark, stats="fuzzy")


def test_batched_scatter_gather_exact(sharded):
    """search_many over shards: one batched job per shard (the
    tree-batch leaf for >=16 queries), global stats round, TopDocs
    merge — bit-identical to the monolithic oracle per query."""
    from lucene_solr_spark.search.sharded import ShardedSearcher

    roots, oracle, spark = sharded
    s = ShardedSearcher(roots, spark, stats="exact", cache=True)
    by_df = _probes(oracle)
    qs = {}
    for i in range(20):
        a = by_df[(7 * i) % len(by_df)]
        b = by_df[-(1 + i % 9)]
        qs[f"q{i}"] = (TermQuery(b) if i % 3 == 0 else
                       BooleanQuery.of(should=[TermQuery(a), TermQuery(b)]))
    got = s.search_many(qs, 12)
    for qid, q in qs.items():
        exp = oracle.search(q, 12)
        assert [(d.docid, np.float32(d.score)) for d in got[qid]] == [
            (d.docid, np.float32(d.score)) for d in exp], qid
