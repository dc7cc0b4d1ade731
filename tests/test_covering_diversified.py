"""CoveringQuery (per-doc minimumNumberMatch, sandbox
CoveringQuery.java) engine/oracle rank+score identity, and
DiversifiedTopDocsCollector (misc/search) vs a brute-force oracle."""

from collections import defaultdict

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    CoveringQuery,
    PhraseQuery,
    TermQuery,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_cov"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    analyzer = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    oracle = OracleIndex(analyzer=analyzer)
    oracle.add_all(pdf["content"])
    # exact post-stop token count per doc — the engine docs table's dl
    dls = [len(analyzer.analyze(t)[0]) for t in pdf["content"]]
    return searcher, oracle, pdf, dls


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


# ---- CoveringQuery ------------------------------------------------------

def _subqueries():
    return (TermQuery("def"), TermQuery("return"), TermQuery("import"),
            TermQuery("class"))


def test_covering_identity_mod_dl(built):
    searcher, oracle, _pdf, dls = built
    q = CoveringQuery(
        _subqueries(), min_match="mod(dl, 3)",
        oracle_min_match=lambda d: dls[d] % 3)
    _identical(searcher, oracle, q, k=20)


def test_covering_clamps_below_one(built):
    """Values < 1 behave like 1 (CoveringQuery.java:45-48): a doc with
    min_match 0 still needs one matching clause."""
    searcher, oracle, _pdf, dls = built
    q = CoveringQuery(
        _subqueries(), min_match="sub(dl, dl)",  # constant 0 per doc
        oracle_min_match=lambda d: 0)
    got = searcher.search(q, 200)
    # identical to a plain 1-of disjunction
    disj = BooleanQuery.of(should=[*_subqueries()])
    exp = searcher.search(disj, 200)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]
    _identical(searcher, oracle, q, k=50)


def test_covering_requires_all_when_min_is_count(built):
    """min_match == number of sub-queries ≙ pure conjunction."""
    searcher, oracle, _pdf, dls = built
    n = len(_subqueries())
    q = CoveringQuery(
        _subqueries(), min_match=f"sum(sub(dl, dl), {n})",
        oracle_min_match=lambda d: n)
    got = {d.docid for d in searcher.search(q, 200)}
    conj = BooleanQuery.of(must=[*_subqueries()])
    exp = {d.docid for d in searcher.search(conj, 200)}
    assert got == exp
    _identical(searcher, oracle, q, k=50)


def test_covering_with_compound_subquery(built):
    """Sub-queries need not be term leaves (any Query is legal)."""
    searcher, oracle, _pdf, dls = built
    subs = (TermQuery("def"), PhraseQuery(("big", "table")),
            BooleanQuery.of(must=[TermQuery("return")]))
    q = CoveringQuery(subs, min_match="mod(dl, 2)",
                      oracle_min_match=lambda d: dls[d] % 2)
    _identical(searcher, oracle, q, k=20)


def test_covering_oracle_null_value_never_matches(built):
    """Docs whose LongValuesSource has no value do not match
    (CoveringScorer.java:131-133)."""
    _searcher, oracle, _pdf, dls = built
    q_all = CoveringQuery(_subqueries(), min_match="1",
                          oracle_min_match=lambda d: 1)
    base = oracle.search(q_all, 500)
    assert base
    blocked = {base[0].docid}
    q = CoveringQuery(
        _subqueries(), min_match="1",
        oracle_min_match=lambda d: None if d in blocked else 1)
    got = {d.docid for d in oracle.search(q, 500)}
    assert blocked.isdisjoint(got)
    assert got == {d.docid for d in base} - blocked


# ---- DiversifiedTopDocsCollector ----------------------------------------

def _brute_diversified(searcher, q, keys: dict[int, str], k, max_per_key):
    hits = searcher.search(q, 10_000)
    per_key: dict[str, int] = defaultdict(int)
    out = []
    for h in hits:  # already (score desc, docid asc)
        key = keys[h.docid]
        if per_key[key] >= max_per_key:
            continue
        per_key[key] += 1
        out.append((h.docid, np.float32(h.score)))
        if len(out) == k:
            break
    return out


def test_diversified_topk_matches_bruteforce(built):
    searcher, _oracle, pdf, _dls = built
    keys = dict(enumerate(pdf["repo"]))
    q = BooleanQuery.of(should=[TermQuery("def"), TermQuery("return")])
    for cap in (1, 2):
        rows = C.diversified_topk(searcher, q, "repo", k=10,
                                  max_per_key=cap).collect()
        got = [(r["docid"], np.float32(r["score"])) for r in rows]
        assert got == _brute_diversified(searcher, q, keys, 10, cap)


def test_diversified_respects_cap(built):
    searcher, _oracle, pdf, _dls = built
    q = TermQuery("def")
    rows = C.diversified_topk(searcher, q, "repo", k=20,
                              max_per_key=2).collect()
    per_key = defaultdict(int)
    for r in rows:
        per_key[r["repo"]] += 1
    assert per_key and max(per_key.values()) <= 2
