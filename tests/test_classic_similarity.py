"""ClassicSimilarity (TF-IDF) as a second pluggable similarity:
Spark engine vs oracle rank/score identity through the same scorer
interface (search/similarities/ClassicSimilarity.java,
TFIDFSimilarity.java; VERDICT round-1 missing #8)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery
from lucene_solr_spark.search.similarities import ClassicScorer

N_DOCS = 100


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_classic"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    s_classic = IndexSearcher(tables, cache=True, similarity="classic")
    s_bm25 = IndexSearcher(tables, cache=True, similarity="bm25")
    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    o_classic = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
                            similarity="classic")
    o_classic.add_all(pdf["content"])
    return s_classic, o_classic, s_bm25


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


def test_classic_formulas():
    sc = ClassicScorer(100)
    # idf = (float)(ln((N+1)/(df+1)) + 1)
    assert np.float32(sc.idf(9)) == np.float32(np.log(101.0 / 10.0) + 1.0)
    # tf = sqrt(freq); norm = 1/sqrt(len)
    w = sc.weight(9, 2.0)
    s = sc.partial(np.array([4]), np.array([16]), w)
    exp = np.float32(np.float32(np.sqrt(4.0)) * w) * np.float32(1 / np.sqrt(16))
    assert np.float32(s[0]) == np.float32(exp)


def test_classic_identity_term_bool_phrase(built):
    s_classic, o_classic, _ = built
    terms = sorted(t for _f, t in o_classic.postings)
    mid = terms[len(terms) // 2]
    hot = max(terms, key=lambda t: o_classic.doc_freq(t))
    _identical(s_classic, o_classic, TermQuery(hot))
    _identical(s_classic, o_classic, TermQuery(mid, boost=2.0))
    _identical(s_classic, o_classic,
               BooleanQuery.of(should=[TermQuery(hot), TermQuery(mid)]))
    _identical(s_classic, o_classic,
               BooleanQuery.of(must=[TermQuery(hot)], must_not=[TermQuery(mid)]))
    # phrase weight = boost * summed idf (TFIDF idfExplain)
    pdf = corpus_pandas(N_DOCS)
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    t0 = an.analyze(pdf["content"].iloc[0])[0]
    _identical(s_classic, o_classic, PhraseQuery((t0[0], t0[1])))


def test_classic_differs_from_bm25(built):
    s_classic, o_classic, s_bm25 = built
    hot = max((t for _f, t in o_classic.postings),
              key=lambda t: o_classic.doc_freq(t))
    a = s_classic.search(TermQuery(hot), 5)
    b = s_bm25.search(TermQuery(hot), 5)
    assert [np.float32(h.score) for h in a] != [np.float32(h.score) for h in b]


def test_boolean_similarity_identity(built, spark, tmp_path_factory):
    """BooleanSimilarity (BooleanSimilarity.java): matching docs score
    exactly the boost; engine vs oracle identity through the same
    pluggable interface."""
    s_classic, _, _ = built
    from lucene_solr_spark.search.executor import IndexSearcher

    s_bool = IndexSearcher(s_classic.tables, cache=True,
                           similarity="boolean")
    o_bool = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        similarity="boolean")
    pdf = corpus_pandas(N_DOCS).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    o_bool.add_all(pdf["content"])
    terms = sorted(t for _f, t in o_bool.postings)
    hot = max(terms, key=lambda t: o_bool.doc_freq(t))
    mid = terms[len(terms) // 2]
    _identical(s_bool, o_bool, TermQuery(hot))
    _identical(s_bool, o_bool, TermQuery(mid, boost=2.5))
    _identical(s_bool, o_bool,
               BooleanQuery.of(should=[TermQuery(hot, boost=3.0),
                                       TermQuery(mid)]))
    # every matching doc scores exactly the boost
    hits = s_bool.search(TermQuery(hot, boost=2.5), 5)
    assert {np.float32(h.score) for h in hits} == {np.float32(2.5)}
