"""Interval queries: minimal-interval algebra goldens (hand-computed)
plus engine-vs-oracle rank/score identity on a real index."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import intervals as I
from lucene_solr_spark.search.executor import IndexSearcher

N_DOCS = 80


def _pos(text: str) -> dict[str, np.ndarray]:
    toks = text.split()
    out: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        out.setdefault(t, []).append(i)
    return {t: np.asarray(p, dtype=np.int64) for t, p in out.items()}


def ivs(src, text):
    return I.enumerate_intervals(src, _pos(text))


# ---- term / or -------------------------------------------------------------

def test_term_intervals():
    assert ivs(I.term("a"), "a b a c a") == [(0, 0, 0), (2, 2, 0), (4, 4, 0)]
    assert ivs(I.term("z"), "a b c") == []


def test_or_minimalizes():
    # "a b" ordered [0,1] vs the bare term b [1,1]: the union keeps
    # ONLY [1,1] — [0,1] contains it (minimal-interval rule)
    src = I.interval_or(I.ordered("a", "b"), I.term("b"))
    assert ivs(src, "a b") == [(1, 1, 0)]


# ---- ordered ----------------------------------------------------------------

def test_ordered_basic_and_gaps():
    assert ivs(I.ordered("a", "c"), "a b c") == [(0, 2, 1)]
    # two disjoint matches
    assert ivs(I.ordered("a", "b"), "a b x a b") == [(0, 1, 0), (3, 4, 0)]
    # wrong order: no match
    assert ivs(I.ordered("b", "a"), "a b") == []


def test_ordered_minimality():
    # text "a a b": anchors at both a's produce [0,2] and [1,2];
    # [0,2] contains [1,2] → only the minimal survives
    assert ivs(I.ordered("a", "b"), "a a b") == [(1, 2, 0)]


def test_ordered_three_children_nested_source():
    src = I.ordered("a", I.interval_or(I.term("b"), I.term("c")), "d")
    assert ivs(src, "a x b d") == [(0, 3, 1)]
    assert ivs(src, "a c x x d") == [(0, 4, 2)]
    assert ivs(src, "a d") == []


# ---- unordered --------------------------------------------------------------

def test_unordered_both_orders():
    src = I.unordered("a", "b")
    assert ivs(src, "b x a") == [(0, 2, 1)]
    assert ivs(src, "a x b") == [(0, 2, 1)]


def test_unordered_minimal_window():
    # "a x a b": windows [0,3] and [2,3]; minimal keeps [2,3]
    assert ivs(I.unordered("a", "b"), "a x a b") == [(2, 3, 0)]


def test_unordered_no_overlaps():
    # single token can't serve both children when overlaps forbidden
    src = I.unordered(I.term("a"), I.term("a"), no_overlaps=True)
    assert ivs(src, "a") == []
    assert ivs(src, "a x a") == [(0, 2, 1)]


# ---- filters ---------------------------------------------------------------

def test_max_gaps_and_phrase():
    assert ivs(I.max_gaps(0, I.ordered("a", "b")), "a x b") == []
    assert ivs(I.max_gaps(1, I.ordered("a", "b")), "a x b") == [(0, 2, 1)]
    assert ivs(I.phrase("a", "b"), "a b c") == [(0, 1, 0)]
    assert ivs(I.phrase("a", "b"), "a c b") == []


def test_max_width():
    assert ivs(I.max_width(2, I.ordered("a", "b")), "a x b") == []
    assert ivs(I.max_width(3, I.ordered("a", "b")), "a x b") == [(0, 2, 1)]


# ---- containing / contained_by ----------------------------------------------

def test_containing():
    big = I.ordered("a", "c")           # [0,2] in "a b c"
    assert ivs(I.containing(big, I.term("b")), "a b c") == [(0, 2, 1)]
    assert ivs(I.containing(big, I.term("z")), "a b c") == []
    assert ivs(I.not_containing(big, I.term("b")), "a b c") == []
    assert ivs(I.not_containing(big, I.term("z")), "a b c") == [(0, 2, 1)]


def test_contained_by():
    big = I.unordered("a", "c")
    assert ivs(I.contained_by(I.term("b"), big), "a b c") == [(1, 1, 0)]
    assert ivs(I.contained_by(I.term("x"), big), "a b c x") == []
    assert ivs(I.not_contained_by(I.term("x"), big), "a b c x") == \
        [(3, 3, 0)]


# ---- freq ------------------------------------------------------------------

def test_interval_freq():
    q = I.IntervalQuery(I.ordered("a", "b"))
    # matches (0,1,0) and (3,5,1): 1/(1+0) + 1/(1+1)
    f = I.interval_freq(q, _pos("a b x a x b"))
    assert f == pytest.approx(1.5)
    assert I.interval_freq(q, _pos("b a")) == 0.0


# ---- engine vs oracle identity ---------------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_iv"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


@pytest.mark.parametrize("mk", [
    lambda: I.IntervalQuery(I.ordered("builder0", "scaned11")),
    lambda: I.IntervalQuery(I.max_gaps(3, I.unordered("geter0", "seter0"))),
    lambda: I.IntervalQuery(I.interval_or(
        I.phrase("builder0", "scaned11"), I.term("makeer0"))),
    lambda: I.IntervalQuery(I.containing(
        I.unordered("geter0", "scaned11"), I.term("seter0"))),
])
def test_engine_oracle_identity(built, mk):
    searcher, oracle = built
    q = mk()
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert exp, "query should match test corpus"
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]


# ---- nonOverlapping / notWithin (DifferenceIntervalFunction) ---------------

def test_non_overlapping():
    # minuend a, subtrahend phrase(a b): a@0 overlaps the (0,1) phrase;
    # a@3 does not overlap any
    q = I.non_overlapping(I.term("a"), I.phrase("a", "b"))
    assert I.enumerate_intervals(q, _pos("a b x a")) == [(3, 3, 0)]
    # empty subtrahend keeps the minuend whole
    q2 = I.non_overlapping(I.term("a"), I.term("zz"))
    assert I.enumerate_intervals(q2, _pos("a x a")) == [(0, 0, 0),
                                                       (2, 2, 0)]


def test_not_within():
    # notWithin(a, 2, b): a intervals farther than 2 positions from b
    # (NotWithinFunction widens b by ±2, start clamped at 0)
    q = I.not_within(I.term("a"), 2, I.term("b"))
    # text: a x x b x x a x x x a → b@3 widened to [1,5];
    # a@0 survives (0 < 1), a@6 overlaps? [1,5] no → survives,
    # wait: a@6 vs [1,5] → no overlap → survives; a@10 survives
    got = I.enumerate_intervals(q, _pos("a x x b x x a x x x a"))
    assert got == [(0, 0, 0), (6, 6, 0), (10, 10, 0)]
    # tighten: notWithin 3 → b widened to [0,6]: only a@10 survives
    q3 = I.not_within(I.term("a"), 3, I.term("b"))
    assert I.enumerate_intervals(
        q3, _pos("a x x b x x a x x x a")) == [(10, 10, 0)]


def test_difference_terms_and_skeleton():
    q = I.IntervalQuery(I.non_overlapping(I.term("a"), I.term("b")))
    assert I.interval_terms(q) == {"a", "b"}
    sk = I.interval_to_boolean(q)
    # subtractive: only the minuend constrains candidates
    from lucene_solr_spark.search.executor import _collect_terms
    assert {t for _f, t in _collect_terms(sk)} == {"a"}


def test_engine_oracle_identity_difference(built):
    searcher, oracle = built
    q = I.IntervalQuery(I.not_within(
        I.term("builder0"), 4, I.term("scaned11")))
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert exp, "query should match test corpus"
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]


# ---- property tests (no Spark) --------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_positions = st.lists(st.integers(0, 40), min_size=0, max_size=12,
                      unique=True).map(sorted)


@given(_positions, _positions)
@settings(max_examples=150, deadline=None)
def test_not_within_zero_is_non_overlapping(pa, pb):
    pos = {"a": np.asarray(pa, dtype=np.int64),
           "b": np.asarray(pb, dtype=np.int64)}
    nw0 = I.enumerate_intervals(I.not_within(I.term("a"), 0, I.term("b")),
                                pos)
    nov = I.enumerate_intervals(I.non_overlapping(I.term("a"),
                                                  I.term("b")), pos)
    assert nw0 == nov


@given(_positions, _positions, st.integers(0, 8))
@settings(max_examples=150, deadline=None)
def test_not_within_monotone_in_positions(pa, pb, k):
    # widening the exclusion zone can only REMOVE minuend intervals
    pos = {"a": np.asarray(pa, dtype=np.int64),
           "b": np.asarray(pb, dtype=np.int64)}
    wide = I.enumerate_intervals(
        I.not_within(I.term("a"), k + 1, I.term("b")), pos)
    narrow = I.enumerate_intervals(
        I.not_within(I.term("a"), k, I.term("b")), pos)
    assert set(wide) <= set(narrow)
    # empty subtrahend keeps everything
    assert I.enumerate_intervals(
        I.not_within(I.term("a"), k, I.term("zz")), pos) == \
        I.enumerate_intervals(I.term("a"), pos)
