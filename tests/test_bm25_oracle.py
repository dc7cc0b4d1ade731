"""BM25 formula unit tests + oracle-engine property tests.

Mirrors TestBM25Similarity / BaseSimilarityTestCase (SURVEY.md §5):
hand-computed float32 values, monotonicity in freq/df/length, tie-break
order, boolean semantics.
"""

import math

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import bm25
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery


def test_idf_formula():
    # idf = (float) ln(1 + (N - n + 0.5)/(n + 0.5))
    v = bm25.idf(1, 100)
    assert v == np.float32(math.log(1 + (100 - 1 + 0.5) / 1.5))
    assert bm25.idf(100, 100) < bm25.idf(1, 100)
    assert bm25.idf(0, 0) == np.float32(math.log(1 + 0.5 / 0.5))


def test_hand_computed_score():
    # one doc "a b a", query "a": tf=2, dl=3, N=1, sumttf=3, avgdl=3
    idx = OracleIndex()
    idx.add("a b a")
    hits = idx.search(TermQuery("a"), 10)
    assert len(hits) == 1
    idf = math.log(1 + (1 - 1 + 0.5) / (1 + 0.5))
    w = np.float32(np.float32(2.2) * np.float32(1.0) * np.float32(idf))
    # norm byte for dl=3 is 3 → LENGTH_TABLE[3]=3.0; cache = k1*((1-b)+b*3/3)=k1
    cache = np.float32(1.2) * (np.float32(0.25) + np.float32(0.75) * np.float32(3.0) / np.float32(3.0))
    expected = np.float32(w * np.float32(2.0 / (2.0 + float(cache))))
    assert hits[0].score == pytest.approx(float(expected), abs=0)
    assert hits[0].docid == 0


def test_monotonicity_properties():
    # BaseSimilarityTestCase.java:243-252 style
    scorer = bm25.BM25Scorer(1000, 50000)
    # increasing freq → non-decreasing score
    w = scorer.weight(10)
    s = bm25.score_terms(np.arange(1, 100), np.full(99, 30), w, scorer.cache)
    assert (np.diff(s) >= 0).all()
    assert (s >= 0).all() and np.isfinite(s).all()
    # longer doc (bigger norm byte → bigger decoded length) → non-increasing
    s2 = bm25.score_terms(np.full(256, 5), np.arange(256), w, scorer.cache)
    assert (np.diff(s2) <= 0).all()
    # rarer term → higher idf
    assert bm25.idf(1, 1000) > bm25.idf(500, 1000)


def test_tiebreak_docid_asc():
    idx = OracleIndex()
    idx.add("x y")   # doc0
    idx.add("x y")   # doc1 — identical stats → identical score
    idx.add("x x y") # doc2 — higher tf
    hits = idx.search(TermQuery("x"), 10)
    assert [h.docid for h in hits] == [2, 0, 1]
    assert hits[1].score == hits[2].score


def test_boolean_or_and_not_msm():
    idx = OracleIndex()
    docs = ["a b c", "a b", "a", "b c", "c", "a c"]
    idx.add_all(docs)
    q_or = BooleanQuery.of(should=[TermQuery("a"), TermQuery("b")])
    got = {h.docid for h in idx.search(q_or, 10)}
    assert got == {0, 1, 2, 3, 5}
    q_and = BooleanQuery.of(must=[TermQuery("a"), TermQuery("b")])
    assert {h.docid for h in idx.search(q_and, 10)} == {0, 1}
    q_not = BooleanQuery.of(must=[TermQuery("a")], must_not=[TermQuery("c")])
    assert {h.docid for h in idx.search(q_not, 10)} == {1, 2}
    q_msm = BooleanQuery.of(
        should=[TermQuery("a"), TermQuery("b"), TermQuery("c")],
        minimum_should_match=2,
    )
    assert {h.docid for h in idx.search(q_msm, 10)} == {0, 1, 3, 5}
    # OR score = f32(sum_f64(per-term f32)); verify against manual
    scorer = idx.scorer()
    ta = idx._match(TermQuery("a"), scorer)
    tb = idx._match(TermQuery("b"), scorer)
    both = idx._match(q_or, scorer)
    s = np.float32(np.float64(ta[0]) + np.float64(tb[0]))
    assert both[0] == float(s)


def test_filter_does_not_score():
    idx = OracleIndex()
    idx.add_all(["a b", "a"])
    q = BooleanQuery.of(must=[TermQuery("a")], filter=[TermQuery("b")])
    hits = idx.search(q, 10)
    assert [h.docid for h in hits] == [0]
    # score equals the MUST-only score for doc0
    only = idx._match(TermQuery("a"), idx.scorer())[0]
    assert hits[0].score == pytest.approx(only, abs=0)


def test_phrase_query():
    idx = OracleIndex()
    idx.add_all([
        "quick brown fox",        # doc0: phrase present
        "brown quick fox",        # doc1: not in order
        "quick slow brown fox",   # doc2: gap
        "quick brown quick brown fox",  # doc3: freq 2
    ])
    hits = idx.search(PhraseQuery(("quick", "brown")), 10)
    ids = {h.docid for h in hits}
    assert ids == {0, 3}
    # slop=1 allows one-position displacement ("quick slow brown")
    hits_slop = idx.search(PhraseQuery(("quick", "brown"), slop=1), 10)
    assert {h.docid for h in hits_slop} >= {0, 2, 3}


def test_stopword_gap_phrase():
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    idx = OracleIndex(analyzer=a)
    idx.add("wrath of khan")  # "of" removed, positions 0,2 preserved
    # phrase with explicit gap (Lucene PhraseQuery builder with positions)
    hits = idx.search(PhraseQuery(("wrath", "khan"), positions=(0, 2)), 10)
    assert [h.docid for h in hits] == [0]
    # contiguous phrase should NOT match across the gap
    assert idx.search(PhraseQuery(("wrath", "khan")), 10) == []


def test_norm_lossy_boundary():
    # lengths > 41 are lossy-encoded; 42 and 43 share byte 41 → equal norms
    idx = OracleIndex()
    idx.add("t " + "f0 " * 41)   # dl = 42 → byte 41
    idx.add("t " + "f1 " * 42)   # dl = 43 → byte 41
    idx.add("t")                 # dl = 1
    h = idx.search(TermQuery("t"), 10)
    assert h[0].docid == 2
    assert h[1].score == h[2].score  # same decoded norm → identical scores
    assert [h[1].docid, h[2].docid] == [0, 1]  # docid tie-break
