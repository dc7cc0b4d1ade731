"""AnalyzingInfixSuggester semantics: infix whole-token + last-prefix
matching, allTermsRequired, weight ordering, highlighting."""

import pytest
from pyspark.sql import SparkSession

from lucene_solr_spark.search.components import build_suggester, suggest_infix

ENTRIES = [
    ("a penny saved is a penny earned", 10),
    ("lend me a penny", 30),
    ("penniless but happy", 20),
    ("saving pennies daily", 25),
    ("no match here", 99),
]


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def sugg(spark):
    df = spark.createDataFrame(ENTRIES, "text string, weight long")
    return build_suggester(df).persist()


def test_last_token_is_prefix_infix(spark, sugg):
    # "penn" prefix-matches penny/penniless/pennies at ANY position
    got = [r.text for r in suggest_infix(sugg, "penn", 10).collect()]
    assert got == [
        "lend me a penny",            # weight 30
        "saving pennies daily",       # 25
        "penniless but happy",        # 20
        "a penny saved is a penny earned",  # 10
    ]


def test_whole_tokens_must_match_exactly(spark, sugg):
    # "saved penn": 'saved' must be a whole token -> only entry 0
    # ('saving' does NOT match the whole token 'saved')
    got = [r.text for r in suggest_infix(sugg, "saved penn", 10).collect()]
    assert got == ["a penny saved is a penny earned"]


def test_all_terms_required_false_ors(spark, sugg):
    got = {r.text for r in
           suggest_infix(sugg, "saved penn", 10,
                         all_terms_required=False).collect()}
    assert "saving pennies daily" in got and "penniless but happy" in got


def test_highlight_wraps_prefix_and_whole(spark, sugg):
    rows = {r.text: r.highlighted for r in
            suggest_infix(sugg, "saved penn", 10).collect()}
    h = rows["a penny saved is a penny earned"]
    # whole token 'saved' fully wrapped; 'penn' prefix wrapped inside
    # each 'penny' (AnalyzingInfixSuggester.java:492-537)
    assert "<b>saved</b>" in h
    assert "<b>penn</b>y" in h
