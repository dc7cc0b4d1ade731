"""Flexible StandardQueryParser (search/flexible.py): config-handler
surface + processor-pipeline rewrites, checked against hand-built
query trees and end-to-end against OracleIndex on a multi-field
corpus (StandardQueryParser.java + its processors)."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.flexible import StandardQueryParser
from lucene_solr_spark.search.parser import QueryParseError
from lucene_solr_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    TermQuery,
)


def test_default_matches_classic():
    p = StandardQueryParser()
    q = p.parse("spark AND index OR table")
    # classic flat algebra: +spark +index table
    occurs = [(c.occur, c.query.term) for c in q.clauses]
    assert occurs == [("MUST", "spark"), ("MUST", "index"),
                      ("SHOULD", "table")]


def test_multi_field_expansion_with_boosts():
    p = StandardQueryParser()
    p.setMultiFields(["title", "content"])
    p.setFieldsBoost({"title": 2.0})
    q = p.parse("spark")
    assert isinstance(q, BooleanQuery)
    got = {(c.query.field, c.query.boost) for c in q.clauses}
    assert got == {("title", 2.0), ("content", 1.0)}
    # explicit field wins over expansion
    q2 = p.parse("content:spark")
    assert isinstance(q2, TermQuery) and q2.field == "content"


def test_phrase_slop_and_fuzzy_config():
    p = StandardQueryParser()
    p.setPhraseSlop(2)
    q = p.parse('"big table"')
    assert isinstance(q, PhraseQuery) and q.slop == 2
    # explicit ~N beats the default slop
    q2 = p.parse('"big table"~5')
    assert q2.slop == 5
    p.setFuzzyMinSim(1)
    p.setFuzzyPrefixLength(2)
    q3 = p.parse("spark~")
    assert isinstance(q3, FuzzyQuery)
    assert q3.max_edits == 1 and q3.prefix_length == 2


def test_leading_wildcard_gate():
    p = StandardQueryParser()
    with pytest.raises(QueryParseError):
        p.parse("*park")
    p.setAllowLeadingWildcard(True)
    p.parse("*park")  # no raise


def test_default_operator_and():
    p = StandardQueryParser()
    p.setDefaultOperator("AND")
    q = p.parse("spark index")
    assert [(c.occur, c.query.term) for c in q.clauses] == [
        ("MUST", "spark"), ("MUST", "index")]


def test_end_to_end_multi_field_oracle():
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    oracle = OracleIndex(analyzer=an)
    docs = [
        {"title": "spark engine", "content": "a distributed query engine"},
        {"title": "index build", "content": "spark builds the index fast"},
        {"title": "unrelated", "content": "nothing to see"},
    ]
    for d in docs:
        oracle.add(d)
    p = StandardQueryParser(analyzer=an)
    p.setMultiFields(["title", "content"])
    p.setFieldsBoost({"title": 3.0})
    q = p.parse("spark")
    hits = oracle.search(q, 10)
    assert [h.docid for h in hits][:2] == [0, 1]
    # equivalent hand-built tree scores identically
    manual = BooleanQuery((
        BooleanClause(TermQuery("spark", boost=3.0, field="title"), "SHOULD"),
        BooleanClause(TermQuery("spark", field="content"), "SHOULD")))
    exp = oracle.search(manual, 10)
    assert [(h.docid, np.float32(h.score)) for h in hits] == [
        (h.docid, np.float32(h.score)) for h in exp]
