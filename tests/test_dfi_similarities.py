"""DFI (divergence from independence) similarity family: formula
parity with the reference (similarities/DFISimilarity.java:59-70,
IndependenceStandardized.java:28-30, IndependenceChiSquared.java:28-30,
IndependenceSaturated.java:27-29) and Spark-engine vs oracle rank/score
identity through the stats_partial hook."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery
from lucene_solr_spark.search.similarities import (
    DFIChiSquaredScorer,
    DFISaturatedScorer,
    DFIStandardizedScorer,
    make_scorer,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE

N_DOCS = 100
FAMILIES = ["dfi_standardized", "dfi_chi_squared", "dfi_saturated"]


def _expected(ttf, dl, sum_ttf):
    return (ttf + 1.0) * dl / (sum_ttf + 1.0)


def test_dfi_standardized_formula():
    sc = DFIStandardizedScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, ttf, boost = 5.0, 9, 30, 1.5
    e = _expected(ttf, dl, 20000)
    assert freq > e  # the interesting branch
    exp = boost * np.log2((freq - e) / np.sqrt(e) + 1.0)
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           boost, df, ttf)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_dfi_chi_squared_formula():
    sc = DFIChiSquaredScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, ttf = 5.0, 9, 30
    e = _expected(ttf, dl, 20000)
    exp = np.log2((freq - e) ** 2 / e + 1.0)
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, df, ttf)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_dfi_saturated_formula():
    sc = DFISaturatedScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, ttf = 5.0, 9, 30
    e = _expected(ttf, dl, 20000)
    exp = np.log2((freq - e) / e + 1.0)
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, df, ttf)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_dfi_zero_when_not_above_expected():
    """freq <= expected scores exactly 0 (DFISimilarity.java:64-66) —
    use a very common term in a long doc so expected > freq."""
    sc = DFIStandardizedScorer(doc_count=10, sum_total_term_freq=1000)
    norm_byte = 100  # long doc
    dl = float(LENGTH_TABLE[norm_byte])
    ttf = 900  # term is most of the collection
    e = _expected(ttf, dl, 1000)
    freq = 1.0
    assert freq <= e
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, 9, ttf)[0]
    assert got == np.float32(0.0)


def test_make_scorer_knows_dfi():
    for name in FAMILIES:
        sc = make_scorer(name, 10, 100)
        assert getattr(sc, "needs_ttf", False) is True


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_dfi"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    out = {}
    for name in FAMILIES:
        searcher = IndexSearcher(tables, cache=True, similarity=name)
        oracle = OracleIndex(
            analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
            similarity=name)
        oracle.add_all(pdf["content"])
        out[name] = (searcher, oracle)
    return out


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


@pytest.mark.parametrize("name", FAMILIES)
def test_identity_term_and_boolean(built, name):
    searcher, oracle = built[name]
    terms = sorted(t for _f, t in oracle.postings)
    hot = max(terms, key=lambda t: oracle.doc_freq(t))
    mid = terms[len(terms) // 2]
    _identical(searcher, oracle, TermQuery(hot))
    _identical(searcher, oracle, TermQuery(mid, boost=1.7))
    _identical(searcher, oracle,
               BooleanQuery.of(should=[TermQuery(hot), TermQuery(mid)]))
