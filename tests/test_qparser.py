"""Solr local-params QParser registry: grammar, dispatch, and the
frange/hash/graphTerms/boost engine leaves vs pure-Python oracles."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.qparser import (
    FunctionBoostQuery,
    FunctionRangeQuery,
    GraphTermsQuery,
    HashQuery,
    SyntaxError_,
    parse_local_params,
    qparse,
)
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_qp"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle, pdf


# ---- local-params grammar ------------------------------------------------
def test_local_params_basic():
    t, local, body = parse_local_params("{!prefix f=title}quer")
    assert (t, body) == ("prefix", "quer")
    assert local["f"] == ["title"]


def test_local_params_quoted_and_v():
    t, local, body = parse_local_params(
        "{!bool must='a b' must=\"c\" v='the body'}ignored")
    assert t == "bool"
    assert local["must"] == ["a b", "c"]    # repeated keys accumulate
    assert body == "the body"               # v overrides trailing text


def test_local_params_dollar_ref():
    t, local, body = parse_local_params(
        "{!filters param=$fqs}x", params={"fqs": ["f1", "f2"]})
    assert local["param"] == ["f1", "f2"]
    assert body == "x"


def test_local_params_plain_query_defaults_to_lucene():
    assert parse_local_params("spark AND query") == (
        "lucene", {}, "spark AND query")


def test_local_params_escaped_quote():
    _t, local, _b = parse_local_params(r"{!switch case.a='x \'y\''}a")
    assert local["case.a"] == ["x 'y'"]


# ---- dispatch --------------------------------------------------------------
def test_qparse_term_raw_field_prefix_terms():
    assert qparse("{!term f=lang}en") == TermQuery("en", field="lang")
    assert qparse("{!raw f=content}The") == TermQuery("The", field="content")
    # field analyzes: lowercased single term / phrase with positions
    assert qparse("{!field f=content}Spark") == TermQuery(
        "spark", field="content")
    ph = qparse("{!field f=content}Big Table")
    assert isinstance(ph, PhraseQuery) and ph.terms == ("big", "table")
    assert qparse("{!prefix f=content}quer") == PrefixQuery(
        "quer", field="content")
    ts = qparse("{!terms f=content}a, b ,c")
    assert ts == TermInSetQuery(("a", "b", "c"), field="content")


def test_qparse_bool_occurs():
    q = qparse("{!bool must='{!term f=content}spark' "
               "must_not='{!term f=content}join' "
               "filter='{!prefix f=content}quer' "
               "should='{!term f=content}vector'}")
    assert isinstance(q, BooleanQuery)
    occurs = sorted((c.occur, getattr(c.query, "term", None))
                    for c in q.clauses)
    assert ("MUST", "spark") in occurs and ("MUST_NOT", "join") in occurs
    assert ("SHOULD", "vector") in occurs


def test_qparse_switch():
    params = {"q": "spark"}
    q = qparse("{!switch case.a='{!term f=content}spark' "
               "default='{!term f=content}vector'}a")
    assert q == TermQuery("spark", field="content")
    q = qparse("{!switch case.a='{!term f=content}spark' "
               "default='{!term f=content}vector'}zzz", params)
    assert q == TermQuery("vector", field="content")
    with pytest.raises(SyntaxError_):
        qparse("{!switch case.a=x}zzz")


def test_qparse_filters_exclude_tags():
    q = qparse("{!filters param='{!term tag=skipme f=content}aaa' "
               "param='{!term f=content}bbb' excludeTags=skipme}"
               "{!term f=content}ccc")
    assert isinstance(q, BooleanQuery)
    kinds = sorted((c.occur, c.query.term) for c in q.clauses)
    assert kinds == [("FILTER", "bbb"), ("MUST", "ccc")]


def test_qparse_nested_query():
    q = qparse("{!query v='{!prefix f=content}qu'}")
    assert q == PrefixQuery("qu", field="content")


def test_qparse_maxscore_groups_should_into_dismax():
    q = qparse("{!maxscore tie=0.3}spark vector +table")
    assert isinstance(q, BooleanQuery)
    dmqs = [c.query for c in q.clauses
            if isinstance(c.query, DisjunctionMaxQuery)]
    assert len(dmqs) == 1 and dmqs[0].tie_breaker == pytest.approx(0.3)
    assert {d.term for d in dmqs[0].disjuncts} == {"spark", "vector"}
    musts = [c for c in q.clauses if c.occur == "MUST"]
    assert len(musts) == 1 and musts[0].query.term == "table"


def test_qparse_unknown_parser():
    with pytest.raises(SyntaxError_):
        qparse("{!nosuch}x")


# ---- engine leaves vs oracles ---------------------------------------------
def _doc_lengths(pdf):
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    return [len(an.analyze(c)[0]) for c in pdf["content"]]


def test_frange_matches_python_filter(built):
    searcher, _oracle, pdf = built
    dls = _doc_lengths(pdf)
    got = {r["docid"] for r in
           searcher.search_df(qparse("{!frange l=20 u=40}dl"), None)
           .collect()}
    want = {i for i, dl in enumerate(dls) if 20 <= dl <= 40}
    assert got == want and want  # non-trivial


def test_frange_exclusive_bounds(built):
    searcher, _oracle, pdf = built
    dls = _doc_lengths(pdf)
    q = qparse("{!frange l=20 u=40 incl=false incu=false}dl")
    got = {r["docid"] for r in searcher.search_df(q, None).collect()}
    assert got == {i for i, dl in enumerate(dls) if 20 < dl < 40}


def _java_string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def test_hash_java_parity_and_partition_laws(built):
    searcher, _oracle, pdf = built
    workers = 3
    parts = []
    for w in range(workers):
        q = qparse(f"{{!hash workers={workers} worker={w} keys=commit}}")
        assert q == HashQuery(("commit",), workers, w)
        parts.append({r["docid"] for r in
                      searcher.search_df(q, None).collect()})
    # disjoint + covering
    alld = set().union(*parts)
    assert alld == set(range(len(pdf)))
    assert sum(len(p) for p in parts) == len(pdf)
    # exact Java assignment per doc (BytesHash → String.hashCode)
    for i, commit in enumerate(pdf["commit"]):
        expect = (_java_string_hash(str(commit)) & 0x7FFFFFFF) % workers
        assert i in parts[expect], (i, commit)


def test_hash_composite_keys_sum(built):
    searcher, _oracle, pdf = built
    workers = 4
    q = qparse(f"{{!hash workers={workers} worker=2 keys=repo,commit}}")
    got = {r["docid"] for r in searcher.search_df(q, None).collect()}
    want = set()
    for i, (repo, commit) in enumerate(zip(pdf["repo"], pdf["commit"])):
        h = _java_string_hash(str(repo)) + _java_string_hash(str(commit))
        if (h & 0x7FFFFFFF) % workers == 2:
            want.add(i)
    assert got == want


def _corpus_dfs(pdf):
    """term → docFreq over the analyzed corpus (pure Python)."""
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    dfs = {}
    for c in pdf["content"]:
        for t in set(an.analyze(c)[0]):
            dfs[t] = dfs.get(t, 0) + 1
    return dfs


def test_graph_terms_df_gate(built):
    searcher, oracle, pdf = built
    dfs = _corpus_dfs(pdf)
    hi = max(dfs, key=dfs.get)
    lo = min((t for t in dfs if dfs[t] < dfs[hi]), key=dfs.get)
    assert dfs[lo] < dfs[hi]
    cutoff = dfs[lo]  # keeps lo (df <= max), drops hi
    q = qparse(f"{{!graphTerms f=content maxDocFreq={cutoff}}}{lo},{hi}")
    assert isinstance(q, GraphTermsQuery)
    got = {r["docid"] for r in searcher.search_df(q, None).collect()}
    want = {d.docid for d in oracle.search(TermQuery(lo), k=10**6)}
    assert got == want
    # constant score
    scores = {np.float32(r["score"]) for r in
              searcher.search_df(q, None).collect()}
    assert scores == {np.float32(1.0)}


def test_function_boost_scales_scores(built):
    searcher, oracle, pdf = built
    term = max(_corpus_dfs(pdf).items(), key=lambda kv: kv[1])[0]
    q = qparse(f"{{!boost b=2}}{{!term f=content}}{term}")
    assert isinstance(q, FunctionBoostQuery)
    base = {d.docid: d.score
            for d in oracle.search(TermQuery(term), k=10**6)}
    assert base
    got = {r["docid"]: r["score"] for r in
           searcher.search_df(q, None).collect()}
    assert set(got) == set(base)
    for d, s in got.items():
        assert np.float32(s) == np.float32(np.float32(base[d]) * 2.0)


def test_qparse_lucene_rank_identity(built):
    searcher, oracle, pdf = built
    dfs = sorted(_corpus_dfs(pdf).items(), key=lambda kv: -kv[1])
    a, b, c = dfs[0][0], dfs[1][0], dfs[2][0]
    q = qparse(f"{a} AND ({b} OR {c})")
    assert oracle.search(q, 10)  # non-trivial
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]


def test_field_join_matches_python(built):
    searcher, oracle, pdf = built
    dfs = _corpus_dfs(pdf)
    term = max(dfs.items(), key=lambda kv: kv[1])[0]
    # docs in the same repo as any doc whose content matches `term`
    q = qparse(f"{{!join from=repo to=repo}}{{!term f=content}}{term}")
    got = {r["docid"] for r in searcher.search_df(q, None).collect()}
    match_docs = {d.docid for d in
                  oracle.search(TermQuery(term), k=10**6)}
    repos = {pdf.iloc[d]["repo"] for d in match_docs}
    want = {i for i in range(len(pdf)) if pdf.iloc[i]["repo"] in repos}
    assert got == want and want
    scores = {np.float32(r["score"]) for r in
              searcher.search_df(q, None).collect()}
    assert scores == {np.float32(1.0)}


def test_field_join_cross_fields(built):
    searcher, oracle, pdf = built
    dfs = _corpus_dfs(pdf)
    term = max(dfs.items(), key=lambda kv: kv[1])[0]
    # lang of matching docs -> docs whose repo... use lang->lang
    q = qparse(f"{{!join from=lang to=lang}}{{!term f=content}}{term}")
    got = {r["docid"] for r in searcher.search_df(q, None).collect()}
    match_docs = {d.docid for d in oracle.search(TermQuery(term), k=10**6)}
    langs = {pdf.iloc[d]["lang"] for d in match_docs}
    want = {i for i in range(len(pdf)) if pdf.iloc[i]["lang"] in langs}
    assert got == want


def test_lucene_q_op_local_param():
    """{!lucene q.op=AND}: the default-operator override
    (LuceneQParserPlugin / QueryParsing's q.op handling)."""
    from lucene_solr_spark.search.qparser import SyntaxError_, qparse

    q_or = qparse("{!lucene df=content}alpha beta")
    q_and = qparse("{!lucene df=content q.op=AND}alpha beta")
    assert [c.occur for c in q_or.clauses] == ["SHOULD", "SHOULD"]
    assert [c.occur for c in q_and.clauses] == ["MUST", "MUST"]
    import pytest as _pytest
    with _pytest.raises(SyntaxError_):
        qparse("{!lucene q.op=XOR}alpha")
