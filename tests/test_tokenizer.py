"""Golden tests for the StandardAnalyzer-equivalent chain.

Expected values taken from the reference's own assertions in
lucene/core/src/test/org/apache/lucene/analysis/standard/TestStandardAnalyzer.java
(line refs inline) — behavior parity, not code.
"""

import pytest

from lucene_solr_spark.analysis import (
    ENGLISH_STOP_WORDS,
    StandardAnalyzer,
    standard_tokenize,
)
from lucene_solr_spark.analysis.tokenizer import standard_tokenize_typed

GOLDENS = [
    # testAlphanumericSA (:224-226)
    ("B2B", ["B2B"]),
    ("2B", ["2B"]),
    # testDelimitersSA (:228-233)
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    # testApostrophesSA (:236-243)
    ("O'Reilly", ["O'Reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she's"]),
    ("Jim's", ["Jim's"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["O'Reilly's"]),
    # testNumericSA (:246-250)
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("216.239.63.104", ["216.239.63.104"]),
    # testTextWithNumbersSA (:254-255)
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    # testVariousTextSA (:259-263)
    ("C embedded developers wanted", ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),
    # testEmpty (:204-208)
    ("", []),
    (".", []),
    (" ", []),
    # testMid (:317-345)
    ("A:B", ["A:B"]),
    ("A::B", ["A", "B"]),
    ("1.2", ["1.2"]),
    ("A.B", ["A.B"]),
    ("1..2", ["1", "2"]),
    ("A..B", ["A", "B"]),
    ("1,2", ["1,2"]),
    ("1,,2", ["1", "2"]),
    ("A.:B", ["A", "B"]),
    ("A:.B", ["A", "B"]),
    ("1,.2", ["1", "2"]),
    ("1.,2", ["1", "2"]),
    ("A:B_A:B", ["A:B_A:B"]),
    ("A:B_A::B", ["A:B_A", "B"]),
    # underscore = ExtendNumLet glue (grammar WB13a/b)
    ("a.b_c-d", ["a.b_c", "d"]),
    ("foo_bar", ["foo_bar"]),
    ("_leading_underscore", ["_leading_underscore"]),
    ("trailing_", ["trailing_"]),
    ("___", []),  # no letter/digit group → no token
    # source-code-ish
    ("public static int main", ["public", "static", "int", "main"]),
    ("utf8 x509 3com", ["utf8", "x509", "3com"]),
    (
        "def foo(x): return x*2  # the result",
        ["def", "foo", "x", "return", "x", "2", "the", "result"],
    ),
]

UNICODE_GOLDENS = [
    # testLUCENE1545 (:213-219): combining char must not split
    ("moͤchte", ["moͤchte"]),
    # testKoreanSA (:267-268)
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    # CJK single-char ideographic + fullwidth digits (:200-201)
    ("我是中国人。 １２３４ Ｔｅｓｔｓ ", ["我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"]),
    # testJapanese (:304-306)
    ("仮名遣い カタカナ", ["仮", "名", "遣", "い", "カタカナ"]),
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_ascii_goldens(text, expected):
    assert standard_tokenize(text) == expected


@pytest.mark.parametrize("text,expected", UNICODE_GOLDENS)
def test_unicode_goldens(text, expected):
    assert standard_tokenize(text) == expected


def test_types():
    # testTypes (:283-286)
    assert standard_tokenize_typed("David has 5000 bones") == [
        ("David", "<ALPHANUM>"),
        ("has", "<ALPHANUM>"),
        ("5000", "<NUM>"),
        ("bones", "<ALPHANUM>"),
    ]
    assert standard_tokenize_typed("21.35") == [("21.35", "<NUM>")]
    assert standard_tokenize_typed("1_2") == [("1_2", "<NUM>")]
    assert standard_tokenize_typed("B2B") == [("B2B", "<ALPHANUM>")]


def test_unicode_types():
    assert standard_tokenize_typed("訓民正音")[0][1] == "<IDEOGRAPHIC>"
    assert standard_tokenize_typed("い")[0][1] == "<HIRAGANA>"
    assert standard_tokenize_typed("カタカナ") == [("カタカナ", "<KATAKANA>")]
    assert standard_tokenize_typed("훈민정음") == [("훈민정음", "<HANGUL>")]


def test_255_char_chop():
    # StandardAnalyzer.java:37,61-69 — long tokens chopped at 255
    long_tok = "x" * 600
    toks = standard_tokenize(f"start {long_tok} end")
    assert toks == ["start", "x" * 255, "x" * 255, "x" * 90, "end"]


def test_ascii_and_unicode_paths_agree():
    # force the unicode engine on ASCII input by appending a non-ASCII
    # char and dropping its token
    samples = [t for t, _ in GOLDENS if t.strip()]
    for s in samples:
        uni = standard_tokenize(s + " 中")
        assert uni[:-1] == standard_tokenize(s), s
        assert uni[-1] == "中"


def test_analyzer_stopfilter_positions():
    a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    # FilteringTokenFilter.java:47-57 — gaps preserved
    terms, positions = a.analyze("the quick fox")
    assert terms == ["quick", "fox"]
    assert positions == [1, 2]
    terms, positions = a.analyze("FooBar BAZ")
    assert terms == ["foobar", "baz"]
    assert positions == [0, 1]
    # default analyzer: EMPTY stop set (StandardAnalyzer.java:79-93)
    terms, _ = StandardAnalyzer().analyze("the quick fox")
    assert terms == ["the", "quick", "fox"]
