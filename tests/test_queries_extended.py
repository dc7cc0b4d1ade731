"""Extended query surface: multi-term expansion (prefix/wildcard/fuzzy/
regexp/range/set), SynonymQuery, DisjunctionMaxQuery, classic query
parser — Spark engine vs oracle rank/score identity (SURVEY §2.4/2.10)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.multiterm import fuzzy_match, osa_distance, wildcard_to_regex
from lucene_solr_spark.search.parser import QueryParser
from lucene_solr_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_ext"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


# ---- unit: expansion helpers ------------------------------------------

def test_wildcard_to_regex():
    assert wildcard_to_regex("fo*") == "fo.*"
    assert wildcard_to_regex("f?o") == "f.o"
    assert wildcard_to_regex(r"a\*b") == "a\\*b"
    assert wildcard_to_regex("a.b") == "a\\.b"


def test_osa_distance():
    assert osa_distance("abcd", "abcd") == 0
    assert osa_distance("abcd", "abdc") == 1  # transposition = 1 edit
    assert osa_distance("abcd", "abc") == 1
    assert osa_distance("abcd", "axyd") == 2
    assert osa_distance("ca", "abc") == 3  # OSA (true damerau would be 2)


def test_fuzzy_match_prefix():
    assert fuzzy_match("receive", "recieve", 2, 0)  # transposition
    assert not fuzzy_match("xeceive", "recieve", 2, 3)  # prefix mismatch
    assert fuzzy_match("recieve", "recieve", 0, 0)


# ---- identity: multi-term queries -------------------------------------

def test_prefix_query(built):
    searcher, oracle = built
    for rw in ("constant_score", "scoring_boolean"):
        _identical(searcher, oracle, PrefixQuery("re", rewrite=rw))
        _identical(searcher, oracle, PrefixQuery("zq", rewrite=rw))  # empty


def test_wildcard_query(built):
    searcher, oracle = built
    _identical(searcher, oracle, WildcardQuery("re*rn"))
    _identical(searcher, oracle, WildcardQuery("?nt", rewrite="scoring_boolean"))


def test_regexp_query(built):
    searcher, oracle = built
    _identical(searcher, oracle, RegexpQuery("ret[a-z]+"))
    _identical(searcher, oracle, RegexpQuery("in[t]?", rewrite="scoring_boolean"))


def test_fuzzy_query(built):
    searcher, oracle = built
    vocab = sorted(t for _f, t in oracle.postings)
    target = vocab[len(vocab) // 3]
    _identical(searcher, oracle, FuzzyQuery(target))
    _identical(searcher, oracle, FuzzyQuery(target, max_edits=1,
                                            rewrite="scoring_boolean"))


def test_term_range_query(built):
    searcher, oracle = built
    _identical(searcher, oracle, TermRangeQuery("ra", "rf"))
    _identical(searcher, oracle,
               TermRangeQuery("ra", "rf", include_lower=False,
                              include_upper=False, rewrite="scoring_boolean"))
    _identical(searcher, oracle, TermRangeQuery(None, "b"))


def test_term_in_set_query(built):
    searcher, oracle = built
    vocab = sorted(t for _f, t in oracle.postings)
    picks = tuple(vocab[:: max(len(vocab) // 5, 1)][:5]) + ("nosuchterm",)
    _identical(searcher, oracle, TermInSetQuery(picks))


def test_multiterm_inside_boolean(built):
    searcher, oracle = built
    q = BooleanQuery(
        (BooleanClause(PrefixQuery("re"), "MUST"),
         BooleanClause(TermQuery("int"), "SHOULD")))
    _identical(searcher, oracle, q)


# ---- identity: synonym + dismax ---------------------------------------

def test_synonym_query(built):
    searcher, oracle = built
    vocab = sorted((t for _f, t in oracle.postings), key=lambda t: oracle.doc_freq(t))
    q = SynonymQuery((vocab[-1], vocab[len(vocab) // 2], "nosuchterm"))
    _identical(searcher, oracle, q)


def test_dismax_query(built):
    searcher, oracle = built
    vocab = sorted((t for _f, t in oracle.postings), key=lambda t: oracle.doc_freq(t))
    subs = (TermQuery(vocab[-1]), TermQuery(vocab[len(vocab) // 2]),
            PhraseQuery((vocab[-1], vocab[-2])))
    _identical(searcher, oracle, DisjunctionMaxQuery(subs, tie_breaker=0.0))
    _identical(searcher, oracle, DisjunctionMaxQuery(subs, tie_breaker=0.3))


# ---- parser -----------------------------------------------------------

def test_parser_ast():
    p = QueryParser(StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    assert p.parse("hello") == TermQuery("hello")
    assert p.parse("Hello WORLD") == BooleanQuery(
        (BooleanClause(TermQuery("hello"), "SHOULD"),
         BooleanClause(TermQuery("world"), "SHOULD")))
    # stopword clause drops out, single survivor unwraps
    assert p.parse("the hello") == TermQuery("hello")


def test_filter_plus_should_matches_filter_only_docs(built):
    searcher, oracle = built
    vocab = sorted((t for _f, t in oracle.postings), key=lambda t: oracle.doc_freq(t))
    rare, common = vocab[0], vocab[-1]
    q = BooleanQuery(
        (BooleanClause(TermQuery(common), "FILTER"),
         BooleanClause(TermQuery(rare), "SHOULD")))
    _identical(searcher, oracle, q, k=20)
    assert searcher.count(q) == oracle.count(q)


def test_parser_boolean_algebra():
    p = QueryParser(StandardAnalyzer())
    q = p.parse("foo AND bar")
    assert q == BooleanQuery(
        (BooleanClause(TermQuery("foo"), "MUST"),
         BooleanClause(TermQuery("bar"), "MUST")))
    q = p.parse("foo bar -baz")
    assert q == BooleanQuery(
        (BooleanClause(TermQuery("foo"), "SHOULD"),
         BooleanClause(TermQuery("bar"), "SHOULD"),
         BooleanClause(TermQuery("baz"), "MUST_NOT")))
    q = p.parse("+foo OR bar")
    assert q.clauses[0].occur == "MUST"
    q = p.parse("NOT foo bar")
    assert q.clauses[0].occur == "MUST_NOT"


def test_parser_phrase_fuzzy_wild_range():
    p = QueryParser(StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    assert p.parse('"big table"') == PhraseQuery(("big", "table"), (0, 1), 0)
    assert p.parse('"big red table"~2').slop == 2
    # stopword gap keeps positions: "state of art" -> (state@0, art@2)
    ph = p.parse('"state of art"')
    assert ph.terms == ("state", "art") and ph.positions == (0, 2)
    assert p.parse("roam~") == FuzzyQuery("roam", max_edits=2)
    assert p.parse("roam~1") == FuzzyQuery("roam", max_edits=1)
    assert p.parse("pre*") == PrefixQuery("pre")
    assert p.parse("te?t") == WildcardQuery("te?t")
    assert p.parse("/ab[c]+/") == RegexpQuery("ab[c]+")
    assert p.parse("[alpha TO beta]") == TermRangeQuery("alpha", "beta")
    assert p.parse("{alpha TO beta}") == TermRangeQuery(
        "alpha", "beta", include_lower=False, include_upper=False)
    assert p.parse("[* TO beta]") == TermRangeQuery(None, "beta")


def test_parser_field_prefix():
    p = QueryParser(StandardAnalyzer())
    assert p.parse("content:hello") == TermQuery("hello")
    assert p.parse("content:pre*") == PrefixQuery("pre")
    # UAX#29 keeps a:b as one token — bare unknown prefix stays a term
    assert p.parse("a:b") == TermQuery("a:b")


def test_parser_boost_and_group():
    p = QueryParser(StandardAnalyzer())
    assert p.parse("foo^2") == TermQuery("foo", boost=2.0)
    q = p.parse("(foo bar)^3")
    assert isinstance(q, BooleanQuery) and q.boost == 3.0
    q = p.parse("foo AND (bar OR baz)")
    assert q.clauses[0] == BooleanClause(TermQuery("foo"), "MUST")
    inner = q.clauses[1].query
    assert {c.query.term for c in inner.clauses} == {"bar", "baz"}


def test_parser_end_to_end_identity(built):
    searcher, oracle = built
    p = QueryParser(StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    for s in ["int AND return", "re* -int", 'int OR "public static"',
              "retur~1 int^2", "[ra TO rz] AND int"]:
        q = p.parse(s)
        _identical(searcher, oracle, q, k=10)
