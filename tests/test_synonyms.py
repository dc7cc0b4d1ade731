"""Synonyms: Solr-format parsing (SolrSynonymParser.java), index-time
stacking filter (SynonymGraphFilter.java posIncrement-0 semantics),
query-time expansion to SynonymQuery (QueryBuilder.newSynonymQuery),
and engine/oracle score identity of the expanded query (VERDICT
round-2 missing #3)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.analysis.filters import CustomAnalyzer
from lucene_solr_spark.analysis.synonym import (
    SynonymMap,
    expand_query,
    synonym_filter,
)
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, SynonymQuery, TermQuery

N_DOCS = 80


# ---- parser -------------------------------------------------------------

def test_parse_equivalence_expand():
    m = SynonymMap.parse("couch, sofa, divan\n# comment\n")
    assert m.outputs("couch") == ("couch", "divan", "sofa")
    assert m.outputs("sofa") == ("couch", "divan", "sofa")
    assert m.outputs("chair") is None


def test_parse_equivalence_noexpand_maps_to_first():
    m = SynonymMap.parse("couch, sofa, divan", expand=False)
    assert m.outputs("sofa") == ("couch",)
    assert m.outputs("couch") == ("couch",)


def test_parse_explicit_mapping_consumes_input():
    m = SynonymMap.parse("small => little, tiny")
    assert m.outputs("small") == ("little", "tiny")
    assert m.outputs("little") is None


def test_parse_case_folding_and_comments():
    m = SynonymMap.parse("Fast, QUICK  # speedy\n")
    assert m.outputs("fast") == ("fast", "quick")


def test_parse_accepts_multiword_into_graph():
    """Multi-word rules land in the graph map (query-time path);
    the index-time FILTER refuses them per SynonymGraphFilter
    guidance (lossy flattening)."""
    m = SynonymMap.parse("usa, united states")
    assert m.has_multi
    assert ("usa",) in m.graph and ("united", "states") in m.graph
    assert ("united", "states") in m.graph[("usa",)]
    with pytest.raises(NotImplementedError):
        synonym_filter(m)


# ---- index-time filter ---------------------------------------------------

def test_filter_stacks_synonyms_at_same_position():
    m = SynonymMap.parse("fast, quick")
    an = CustomAnalyzer([synonym_filter(m)])
    terms, pos = an.analyze("a fast car")
    # "fast" (pos 1) expands to both members at position 1
    assert ("fast", 1) in zip(terms, pos)
    assert ("quick", 1) in zip(terms, pos)
    assert ("a", 0) in zip(terms, pos)
    assert ("car", 2) in zip(terms, pos)


def test_filter_explicit_rule_replaces_token():
    m = SynonymMap.parse("small => little")
    an = CustomAnalyzer([synonym_filter(m)])
    terms, pos = an.analyze("small dog")
    assert "small" not in terms
    assert ("little", 0) in zip(terms, pos)


# ---- query-time expansion ------------------------------------------------

def test_expand_term_query():
    m = SynonymMap.parse("fast, quick")
    q = expand_query(TermQuery("fast", boost=2.0), m)
    assert isinstance(q, SynonymQuery)
    assert q.terms == ("fast", "quick")
    assert q.boost == 2.0


def test_expand_recurses_into_boolean():
    m = SynonymMap.parse("fast, quick")
    q = expand_query(
        BooleanQuery.of(must=[TermQuery("fast")],
                        should=[TermQuery("car")]), m)
    assert isinstance(q.clauses[0].query, SynonymQuery)
    assert isinstance(q.clauses[1].query, TermQuery)


def test_expand_unmapped_passthrough():
    m = SynonymMap.parse("fast, quick")
    q = TermQuery("car")
    assert expand_query(q, m) is q


# ---- engine vs oracle identity of the expanded query ---------------------

def test_expanded_query_identity(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_syn"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle.add_all(pdf["content"])

    terms = sorted({t for _f, t in oracle.postings})
    a = max(terms, key=lambda t: oracle.doc_freq(t))
    b = terms[len(terms) // 3]
    m = SynonymMap.parse(f"{a}, {b}")
    q = expand_query(TermQuery(a), m)
    assert isinstance(q, SynonymQuery)
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]


# ---- multi-word graph expansion (QueryBuilder.analyzeGraphBoolean) -------

def test_expand_text_multiword_longest_match():
    from lucene_solr_spark.analysis.synonym import expand_query_text
    from lucene_solr_spark.search.queries import PhraseQuery

    m = SynonymMap.parse("usa, united states\nny => new york")
    # longest match consumes "united states" as one slice
    q = expand_query_text(["visit", "united", "states", "ny"], m)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 3
    visit, us, ny = [c.query for c in q.clauses]
    assert visit == TermQuery("visit")
    # slice 2: original span (phrase) + single-token synonym "usa"
    assert isinstance(us, BooleanQuery)
    kinds = {type(a.query) for a in us.clauses}
    assert kinds == {TermQuery, PhraseQuery}
    phr = [a.query for a in us.clauses if isinstance(a.query, PhraseQuery)]
    assert phr[0].terms == ("united", "states")
    # slice 3: "ny" consumed by => rule; output path is a phrase,
    # original kept as the graph articulation's own side
    assert isinstance(ny, BooleanQuery)
    nyp = [a.query for a in ny.clauses if isinstance(a.query, PhraseQuery)]
    assert nyp[0].terms == ("new", "york")


def test_expand_term_with_multiword_output():
    from lucene_solr_spark.search.queries import PhraseQuery

    m = SynonymMap.parse("ny => new york, bigapple")
    q = expand_query(TermQuery("ny"), m)
    assert isinstance(q, BooleanQuery)
    types = sorted(type(c.query).__name__ for c in q.clauses)
    assert types == ["PhraseQuery", "SynonymQuery"]
    syn = [c.query for c in q.clauses
           if isinstance(c.query, SynonymQuery)][0]
    assert set(syn.terms) == {"ny", "bigapple"}


def test_multiword_expansion_end_to_end(spark, tmp_path_factory):
    """A query term whose only synonym output is a multi-word path
    must match docs containing the literal phrase — engine vs oracle
    rank/score identity on the expanded query tree. (The rule's rhs
    is a bigram the synthetic corpus actually contains.)"""
    from lucene_solr_spark.analysis.synonym import expand_query_text

    root = str(tmp_path_factory.mktemp("index_msyn"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle.add_all(pdf["content"])

    m = SynonymMap.parse("bigtable => builder0 scaned11")
    q = expand_query_text(["bigtable"], m)
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert exp, "corpus should contain 'builder0 scaned11' phrases"
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]
