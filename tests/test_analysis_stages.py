"""FieldAnalysisRequestHandler-style per-stage debug output."""

from lucene_solr_spark.analysis.charfilters import html_strip
from lucene_solr_spark.analysis.filters import (
    CustomAnalyzer,
    analysis_stages,
    english_analyzer,
    stop_filter,
)


def test_stage_names_and_order():
    st = analysis_stages(english_analyzer(), "The Dogs' amazing Barking")
    assert [s["stage"] for s in st] == [
        "tokenizer:standard", "filter:lowercase",
        "filter:english_possessive_filter", "filter:stop_filter",
        "filter:porter_stem_filter",
    ]


def test_stages_show_drops_and_rewrites():
    st = {s["stage"]: s for s in
          analysis_stages(english_analyzer(), "The Dogs' amazing Barking")}
    assert st["tokenizer:standard"]["terms"] == [
        "The", "Dogs", "amazing", "Barking"]
    # stop filter drops 'the' but keeps the position gap
    assert st["filter:stop_filter"]["terms"] == ["dogs", "amazing", "barking"]
    assert st["filter:stop_filter"]["positions"] == [1, 2, 3]
    assert st["filter:porter_stem_filter"]["terms"] == ["dog", "amaz", "bark"]


def test_char_filter_stage_reports_text():
    ana = CustomAnalyzer(filters=[stop_filter(frozenset({"a"}))],
                         char_filters=[html_strip])
    st = analysis_stages(ana, "<b>a dog</b>")
    assert st[0]["stage"].startswith("charfilter:")
    assert "<b>" not in st[0]["text"]
    assert st[-1]["terms"] == ["dog"]


def test_final_stage_equals_analyze():
    ana = english_analyzer()
    st = analysis_stages(ana, "Wonderful barking dogs")
    terms, positions = ana.analyze("Wonderful barking dogs")
    assert st[-1]["terms"] == terms and st[-1]["positions"] == positions
