"""cache="buckets" LRU postings cache: identical results to the
uncached searcher, memory bounded by the query working set (round-2
plan-audit note on the searcher-lifetime full persist)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.index import build_index
from lucene_solr_spark.search.executor import IndexSearcher, term_bucket
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery

N_DOCS = 200


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_bcache"))
    return build_index(corpus_df(spark, N_DOCS, partitions=4), root,
                       stop_words=ENGLISH_STOP_WORDS, n_buckets=16)


def _hits(searcher, q, k=10):
    return [(h.docid, np.float32(h.score)) for h in searcher.search(q, k)]


def test_bucket_cache_identity(tables):
    plain = IndexSearcher(tables, cache=False)
    lru = IndexSearcher(tables, cache="buckets")
    queries = [
        TermQuery("return"),
        BooleanQuery.of(should=[TermQuery("def"), TermQuery("import")]),
        BooleanQuery.of(must=[TermQuery("return")],
                        must_not=[TermQuery("class")]),
        PhraseQuery(("def", "main")),  # positions path bypasses the cache
    ]
    for q in queries:
        assert _hits(lru, q) == _hits(plain, q), q
    assert len(lru._bucket_cache) > 0  # something was actually cached


def test_bucket_cache_lru_eviction(tables):
    lru = IndexSearcher(tables, cache="buckets")
    lru.BUCKET_CACHE_MAX = 2
    plain = IndexSearcher(tables, cache=False)
    # pick REAL dictionary terms spanning >2 distinct buckets so every
    # probe reaches the postings scan (df=0 short-circuits before it)
    import pyspark.sql.functions as F
    rows = (tables.dict().where(F.col("df") > 3)
            .select("term", "bucket").limit(500).collect())
    terms, seen = [], set()
    for r in rows:
        if r["bucket"] not in seen:
            seen.add(r["bucket"])
            terms.append(r["term"])
        if len(terms) >= 5:
            break
    assert len(terms) >= 4
    for t in terms:
        q = TermQuery(t)
        assert _hits(lru, q) == _hits(plain, q), t
    assert len(lru._bucket_cache) <= 2          # capacity respected
    assert lru.bucket_cache_evictions >= len(terms) - 2  # LRU actually evicted
    # evicted buckets reload transparently with identical results
    q0 = TermQuery(terms[0])
    assert _hits(lru, q0) == _hits(plain, q0)
