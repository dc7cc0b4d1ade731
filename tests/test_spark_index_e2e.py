"""End-to-end rank-identity: Spark engine vs pure-Python oracle.

SURVEY.md §5 item 5 / FIXTURES.md F4: build the index with Spark from
the deterministic corpus, run a query battery, and require docID order
AND float32 scores to match the oracle exactly (not approximately).
Also checks index invariants (CheckIndex analogue): dict df/ttf vs
actual postings, per-row sha256, docid determinism across rebuilds.
"""

import hashlib

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher, term_bucket
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    TermQuery,
)

N_DOCS = 96


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    corpus = corpus_df(spark, N_DOCS, partitions=5)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)

    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return tables, searcher, oracle, pdf


def _pick_terms(oracle):
    """Terms across the df spectrum (FIXTURES F8 style)."""
    by_df = sorted((t for _f, t in oracle.postings), key=lambda t: (oracle.doc_freq(t), t))
    lo = by_df[0]
    mid = by_df[len(by_df) // 2]
    hi = by_df[-1]
    return lo, mid, hi


def test_stats_match(built):
    _, searcher, oracle, _ = built
    assert searcher.doc_count == oracle.doc_count
    assert searcher.sum_ttf == oracle.sum_ttf


def test_dict_invariants(built):
    tables, _, oracle, _ = built
    rows = tables.dict().collect()
    got = {r["term"]: (r["df"], r["ttf"]) for r in rows}
    exp = {t: (len(pl), sum(tf for _, tf, _ in pl)) for (_f, t), pl in oracle.postings.items()}
    assert got == exp
    # bucket column consistent with the Python-side hash
    for r in rows[:200]:
        assert r["bucket"] == term_bucket(r["term"], 8)


def test_sha256_invariant(built):
    tables, _, _, pdf = built
    rows = tables.docs().orderBy("docid").collect()
    assert len(rows) == len(pdf)
    for r, (_, src) in zip(rows, pdf.iterrows()):
        assert r["repo"] == src["repo"] and r["path"] == src["path"]
        assert r["content_sha256"] == hashlib.sha256(src["content"].encode()).hexdigest()


QUERY_KINDS = ["single_lo", "single_mid", "single_hi", "or2", "and2", "or3msm2",
               "not", "filter", "boost", "matchall"]


@pytest.mark.parametrize("kind", QUERY_KINDS)
def test_rank_identical(built, kind):
    _, searcher, oracle, _ = built
    lo, mid, hi = _pick_terms(oracle)
    q = {
        "single_lo": TermQuery(lo),
        "single_mid": TermQuery(mid),
        "single_hi": TermQuery(hi),
        "or2": BooleanQuery.of(should=[TermQuery(mid), TermQuery(hi)]),
        "and2": BooleanQuery.of(must=[TermQuery(mid), TermQuery(hi)]),
        "or3msm2": BooleanQuery.of(
            should=[TermQuery(lo), TermQuery(mid), TermQuery(hi)],
            minimum_should_match=2,
        ),
        "not": BooleanQuery.of(must=[TermQuery(hi)], must_not=[TermQuery(mid)]),
        "filter": BooleanQuery.of(must=[TermQuery(hi)], filter=[TermQuery(mid)]),
        "boost": BooleanQuery.of(should=[TermQuery(mid, boost=2.5), TermQuery(hi)]),
        "matchall": MatchAllDocsQuery(),
    }[kind]
    k = 20
    got = searcher.search(q, k)
    exp = oracle.search(q, k)
    assert [h.docid for h in got] == [h.docid for h in exp], kind
    g = np.array([h.score for h in got], dtype=np.float32)
    e = np.array([h.score for h in exp], dtype=np.float32)
    assert (g == e).all(), f"{kind}: scores differ: {g} vs {e}"


def test_count_matches(built):
    _, searcher, oracle, _ = built
    _, mid, hi = _pick_terms(oracle)
    q = BooleanQuery.of(should=[TermQuery(mid), TermQuery(hi)])
    assert searcher.count(q) == oracle.count(q)


def test_phrase_rank_identical(built):
    _, searcher, oracle, pdf = built
    # find a bigram that actually occurs
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    terms, _ = a.analyze(pdf["content"].iloc[0])
    bigram = None
    for i in range(len(terms) - 1):
        if terms[i] != terms[i + 1]:
            bigram = (terms[i], terms[i + 1])
            break
    assert bigram
    q = PhraseQuery(bigram)
    got = searcher.search(q, 15)
    exp = oracle.search(q, 15)
    assert [(h.docid, np.float32(h.score)) for h in got] == [
        (h.docid, np.float32(h.score)) for h in exp
    ]
    assert len(got) > 0


@pytest.mark.parametrize("slop", [1, 2, 3])
def test_sloppy_phrase_rank_identical(built, slop):
    """Sloppy phrase (SloppyPhraseMatcher semantics) — engine vs oracle
    score identity at slop∈{1,2,3} (judge round-1 item 6)."""
    _, searcher, oracle, pdf = built
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    terms, _ = a.analyze(pdf["content"].iloc[0])
    pair = None
    for i in range(len(terms) - 2):
        if len({terms[i], terms[i + 2]}) == 2:
            pair = (terms[i], terms[i + 2])  # one-apart pair → needs slop
            break
    assert pair
    q = PhraseQuery(pair, slop=slop)
    got = searcher.search(q, 20)
    exp = oracle.search(q, 20)
    assert [(h.docid, np.float32(h.score)) for h in got] == [
        (h.docid, np.float32(h.score)) for h in exp
    ]
    assert len(exp) > 0


def test_search_many_rank_identical(built):
    """Batched execution must match per-query oracle results exactly."""
    _, searcher, oracle, _ = built
    lo, mid, hi = _pick_terms(oracle)
    batch = {
        "q1": TermQuery(hi),
        "q2": BooleanQuery.of(should=[TermQuery(mid), TermQuery(hi)]),
        "q3": BooleanQuery.of(must=[TermQuery(mid), TermQuery(hi)]),
        "q4": BooleanQuery.of(
            should=[TermQuery(lo), TermQuery(mid), TermQuery(hi)],
            minimum_should_match=2,
        ),
        "q5": BooleanQuery.of(must=[TermQuery(hi)], must_not=[TermQuery(mid)]),
        "q6": BooleanQuery.of(must=[TermQuery(hi)], filter=[TermQuery(mid)]),
        "q7": TermQuery("zz_not_a_term"),
    }
    # both batched strategies must be rank/score-identical to the
    # oracle: the declarative groupBy+window plan (default) and the
    # partition-local numpy collector (mapInArrow)
    for collector in (False, True):
        searcher.batch_collector = collector
        got = searcher.search_many(batch, 12)
        for qid, q in batch.items():
            exp = oracle.search(q, 12)
            assert [(h.docid, np.float32(h.score)) for h in got[qid]] == [
                (h.docid, np.float32(h.score)) for h in exp
            ], (qid, collector)
    searcher.batch_collector = False


def test_search_after(built):
    _, searcher, oracle, _ = built
    _, _, hi = _pick_terms(oracle)
    q = TermQuery(hi)
    page1 = searcher.search(q, 5)
    page2 = searcher.search_after(q, page1[-1], 5)
    exp = oracle.search(q, 10)
    assert [h.docid for h in page1 + page2] == [h.docid for h in exp]


def test_docid_determinism(spark, built, tmp_path_factory):
    """Rebuild with a different partition count → identical docids."""
    tables, _, _, _ = built
    root2 = str(tmp_path_factory.mktemp("index2"))
    corpus = corpus_df(spark, N_DOCS, partitions=3)
    t2 = build_index(corpus, root2, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    d1 = {r["docid"]: r["content_sha256"] for r in tables.docs().collect()}
    d2 = {r["docid"]: r["content_sha256"] for r in t2.docs().collect()}
    assert d1 == d2


def test_filter_only_msm_and_absent_must_with_filter(built):
    """BooleanWeight.java:396/:374-378 on the v1 engine's filter-only
    branch (round-5 review finding): FILTER-only + msm>0 is
    unsatisfiable, and an absent MUST term with a present FILTER
    yields no hits — both must match the oracle."""
    from lucene_solr_spark.search.queries import BooleanClause

    _, searcher, oracle, _ = built
    _lo, _mid, hi = _pick_terms(oracle)
    q1 = BooleanQuery((BooleanClause(TermQuery(hi), "FILTER"),),
                      minimum_should_match=1)
    assert oracle.search(q1, 10) == []
    assert searcher.search(q1, 10) == []
    # absent MUST + present FILTER: required null scorer -> no hits
    q2 = BooleanQuery.of(must=[TermQuery("zzzznotaterm")],
                         should=[],
                         )
    q2 = BooleanQuery((BooleanClause(TermQuery("zzzznotaterm"), "MUST"),
                       BooleanClause(TermQuery(hi), "FILTER")))
    assert oracle.search(q2, 10) == []
    assert searcher.search(q2, 10) == []
    # sanity: FILTER-only with msm=0 still matches with score 0
    q3 = BooleanQuery((BooleanClause(TermQuery(hi), "FILTER"),))
    exp = oracle.search(q3, 10)
    got = searcher.search(q3, 10)
    assert [(d.docid, d.score) for d in got] == [
        (d.docid, d.score) for d in exp]
    assert got and all(d.score == 0.0 for d in got)
