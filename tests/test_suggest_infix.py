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


class TestBlended:
    """BlendedInfixSuggester position blending
    (BlendedInfixSuggester.java:86-93, :308-327): weight scaled by a
    coefficient of the first matching token position, (long) truncated
    (:228)."""

    def test_linear_coefficient(self, spark, sugg):
        rows = {r.text: r.score for r in suggest_infix(
            sugg, "penn", 10, blender_type="linear").collect()}
        # "penniless but happy": match at position 0 → 20 * 1.0 = 20
        assert rows["penniless but happy"] == 20
        # "lend me a penny": position 3 → 30 * (1 - 0.3) = 21
        assert rows["lend me a penny"] == 21
        # "saving pennies daily": position 1 → 25 * 0.9 = 22 (22.5 → 22)
        assert rows["saving pennies daily"] == 22
        # "a penny saved...": first match position 1 → 10 * 0.9 = 9
        assert rows["a penny saved is a penny earned"] == 9

    def test_reciprocal_reorders(self, spark, sugg):
        got = [r.text for r in suggest_infix(
            sugg, "penn", 10, blender_type="reciprocal").collect()]
        # reciprocal: 20/(0+1)=20, 25/2=12, 30/4=7, 10/2=5 → the
        # position-0 match overtakes the higher raw weights
        assert got[0] == "penniless but happy"
        scores = [r.score for r in suggest_infix(
            sugg, "penn", 10, blender_type="reciprocal").collect()]
        assert scores == [20, 12, 7, 5]

    def test_exponential_reciprocal(self, spark, sugg):
        rows = {r.text: r.score for r in suggest_infix(
            sugg, "penn", 10, blender_type="exponential_reciprocal",
            exponent=2.0).collect()}
        # 30/(3+1)^2 = 1.875 → 1
        assert rows["lend me a penny"] == 1

    def test_whole_token_position(self, spark, sugg):
        # two query tokens: whole "saved" + prefix "penn" — first
        # MATCHING position counts, whichever kind matches first
        rows = {r.text: r.score for r in suggest_infix(
            sugg, "saved penn", 10, blender_type="linear").collect()}
        # "a penny saved...": penny@1 matches prefix first → 0.9
        assert rows["a penny saved is a penny earned"] == 9

    def test_invalid_blender(self, spark, sugg):
        with pytest.raises(ValueError):
            suggest_infix(sugg, "penn", 10, blender_type="bogus")
