"""Solr minimum-should-match spec grammar (search/mm.py port of
SolrPluginUtils.calculateMinShouldMatch:671-709) + edismax mm=spec
wiring. Pure-Python — no Spark session."""

from lucene_solr_spark.search.components import edismax_query
from lucene_solr_spark.search.mm import calc_min_should_match as mm


def test_absolute_and_negative():
    assert mm(5, "3") == 3
    assert mm(5, "-2") == 3
    assert mm(5, "8") == 5        # clamped to optional count
    assert mm(5, "-8") == 0       # clamped at zero


def test_percentages_round_down():
    assert mm(5, "75%") == 3      # 3.75 → 3
    assert mm(5, "-25%") == 4     # 5 + int(-1.25) = 4 (trunc toward 0)
    assert mm(4, "50%") == 2
    assert mm(3, "-25%") == 3     # int(-0.75) = 0


def test_conditional_spec():
    spec = "2<-25% 9<-3"
    assert mm(1, spec) == 1       # at/below every bound → all required
    assert mm(2, spec) == 2
    assert mm(3, spec) == 3
    assert mm(10, spec) == 7      # above 9 → all-but-3
    assert mm(12, "3<90%") == 10  # 12*0.9 = 10.8 → 10


def test_whitespace_around_less_than():
    assert mm(10, "2 < -25% 9 <-3") == 7


def test_edismax_accepts_spec_string():
    q = edismax_query("alpha beta gamma delta", {"content": 1.0},
                      minimum_should_match="75%")
    assert q.minimum_should_match == 3
    q2 = edismax_query("alpha beta gamma delta", {"content": 1.0},
                       minimum_should_match="-1")
    assert q2.minimum_should_match == 3
    # MUST/MUST_NOT clauses are not optional
    q3 = edismax_query("+alpha beta gamma -delta", {"content": 1.0},
                       minimum_should_match="100%")
    assert q3.minimum_should_match == 2


def test_parser_constant_score_operator():
    """^=N (SolrQueryParserBase constant-score operator) parses to
    ConstantScoreQuery with the given score."""
    from lucene_solr_spark.search.parser import QueryParser
    from lucene_solr_spark.search.queries import (
        BooleanQuery,
        ConstantScoreQuery,
        TermQuery,
    )

    p = QueryParser()
    q = p.parse("content:spark^=3")
    assert q == ConstantScoreQuery(TermQuery("spark"), boost=3.0)
    mixed = p.parse("spark^=2.5 vector")
    assert isinstance(mixed, BooleanQuery)
    kinds = {type(c.query) for c in mixed.clauses}
    assert ConstantScoreQuery in kinds and TermQuery in kinds


def test_parse_elevate_xml():
    from lucene_solr_spark.search.components import parse_elevate_xml

    cfg = parse_elevate_xml("""
    <elevate>
      <query text="aaa">
        <doc id="7"/><doc id="3"/>
        <doc id="9" exclude="true"/>
      </query>
      <query text="bbb"><doc id="1"/></query>
    </elevate>""")
    assert cfg == {"aaa": (["7", "3"], ["9"]), "bbb": (["1"], [])}
