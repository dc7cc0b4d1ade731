"""Filter zoo: Porter stemmer goldens, possessive/folding/length,
ngram/edge-ngram/shingle position semantics, CustomAnalyzer identity
between the Python chain and the Spark column twin."""

import pytest

from lucene_solr_spark.analysis.filters import (
    CustomAnalyzer,
    ascii_fold,
    ascii_folding_filter,
    edge_ngram_filter,
    english_analyzer,
    english_possessive_filter,
    filter_tokens_column,
    length_filter,
    ngram_filter,
    porter_stem,
    porter_stem_filter,
    shingle_filter,
    stop_filter,
)
from lucene_solr_spark.analysis.tokenizer import ENGLISH_STOP_WORDS


# Golden pairs from Porter's 1980 paper examples (+ the Lucene
# DEPARTURE cases bli→ble / logi→log).
PORTER_GOLDENS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform",  # bli→ble (DEPARTURE), then step4 able (m>1)
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # short words unchanged
    "a": "a", "is": "is", "be": "be",
}


def test_porter_goldens():
    bad = {w: (porter_stem(w), want)
           for w, want in PORTER_GOLDENS.items() if porter_stem(w) != want}
    assert not bad, f"porter mismatches (got, want): {bad}"


def test_possessive():
    terms, pos = english_possessive_filter(
        ["john's", "dogs", "o’neill’s"], [0, 1, 2])
    assert terms == ["john", "dogs", "o’neill"]
    assert pos == [0, 1, 2]


def test_ascii_folding():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("über") == "uber"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("łódź") == "lodz"
    assert ascii_fold("plain") == "plain"
    t, p = ascii_folding_filter(["naïve", "façade"], [0, 1])
    assert t == ["naive", "facade"]


def test_length_filter_keeps_gaps():
    t, p = length_filter(2, 5)(["a", "abc", "toolongtoken", "de"], [0, 1, 2, 3])
    assert t == ["abc", "de"]
    assert p == [1, 3]  # gap where dropped tokens were


def test_ngram_filter_positions():
    t, p = ngram_filter(2, 3)(["abcd"], [5])
    assert t == ["ab", "bc", "cd", "abc", "bcd"]
    assert p == [5] * 5  # all grams stack at the source position


def test_edge_ngram():
    t, p = edge_ngram_filter(1, 3)(["spark"], [2])
    assert t == ["s", "sp", "spa"]
    assert p == [2, 2, 2]
    t, _ = edge_ngram_filter(1, 3, preserve_original=True)(["spark"], [0])
    assert t == ["s", "sp", "spa", "spark"]


def test_shingles_with_filler():
    # "please divide <stop> sentence" — stopword at position 2 leaves a
    # gap, shingles crossing it use the _ filler (ShingleFilter.java)
    terms = ["please", "divide", "sentence"]
    positions = [0, 1, 3]
    t, p = shingle_filter(2, 2)(terms, positions)
    assert ("please divide", 0) in list(zip(t, p))
    assert ("divide _", 1) in list(zip(t, p))  # gap filler
    assert ("_ sentence", 2) in list(zip(t, p))  # filler participates
    # unigrams present
    for u in terms:
        assert u in t
    t2, _ = shingle_filter(2, 3, output_unigrams=False)(terms, positions)
    assert "please divide" in t2 and "please divide _" in t2
    assert all(" " in s for s in t2)


def test_english_analyzer_pipeline():
    an = english_analyzer()
    terms, positions = an.analyze("The Dog's bones are running quickly")
    # the(stop) dog's→dog→dog bones→bone are(stop) running→run quickly→quickli
    assert terms == ["dog", "bone", "run", "quickli"]
    assert positions == [1, 2, 4, 5]  # gaps at stopwords


def test_oracle_with_custom_analyzer():
    """CustomAnalyzer plugs into the oracle engine: stemmed index
    matches stemmed queries regardless of surface form."""
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.search.queries import TermQuery

    an = english_analyzer()
    idx = OracleIndex(analyzer=an)
    idx.add("the dogs were running")
    idx.add("a dog runs")
    idx.add("cats sleep")
    hits = idx.search(TermQuery(an.terms("running")[0]), 10)
    assert sorted(h.docid for h in hits) == [0, 1]


def test_spark_column_twin_matches_python(spark):
    """filter_tokens_column(chain) ≡ CustomAnalyzer(chain) term output."""
    import pandas as pd
    from pyspark.sql import functions as F

    texts = [
        "The Dog's bones are running quickly",
        "Stemming filters normalize tokenized words",
        "café straße naïve",
        "",
    ]
    chain = [english_possessive_filter, stop_filter(ENGLISH_STOP_WORDS),
             ascii_folding_filter, porter_stem_filter]
    an = CustomAnalyzer(chain)
    sdf = spark.createDataFrame(pd.DataFrame({"id": range(len(texts)),
                                              "text": texts}))
    from lucene_solr_spark.analysis.jvm import analyzed_columns

    tok = analyzed_columns(sdf, content_col="text", with_sha=False)
    out = filter_tokens_column(tok, chain, "tokens", "filtered")
    got = {r["id"]: r["filtered"] for r in out.select("id", "filtered").collect()}
    for i, text in enumerate(texts):
        assert got[i] == an.analyze(text)[0], f"row {i}"


# -- CJKBigramFilter -------------------------------------------------------
from lucene_solr_spark.analysis.filters import cjk_bigram_filter  # noqa: E402


class TestCJKBigram:
    def test_han_bigrams(self):
        an = CustomAnalyzer([cjk_bigram_filter()])
        terms, pos = an.analyze("Spark处理大数据 fast")
        # 处理 理大 大数 数据 as overlapping bigrams at first-member pos
        assert ("处理", 1) in zip(terms, pos)
        assert ("理大", 2) in zip(terms, pos)
        assert ("数据", 4) in zip(terms, pos)
        assert "spark" in terms and "fast" in terms
        assert "处" not in terms  # consumed into bigrams

    def test_single_cjk_token_passes_as_unigram(self):
        an = CustomAnalyzer([cjk_bigram_filter()])
        terms, _ = an.analyze("one 处 two")
        assert "处" in terms

    def test_output_unigrams(self):
        an = CustomAnalyzer([cjk_bigram_filter(output_unigrams=True)])
        terms, _ = an.analyze("处理")
        assert "处" in terms and "理" in terms and "处理" in terms

    def test_gap_breaks_run(self):
        # a stop-filtered token between ideographs breaks adjacency
        from lucene_solr_spark.analysis.filters import stop_filter

        an = CustomAnalyzer([stop_filter(frozenset(["the"])),
                             cjk_bigram_filter()])
        terms, _ = an.analyze("处 the 理")
        assert "处理" not in terms
        assert "处" in terms and "理" in terms

    def test_katakana_word_bigrams_with_han(self):
        # katakana run-token decomposes to codepoints and chains into
        # the adjacent han chars (CJKBigramFilter.java refill())
        an = CustomAnalyzer([cjk_bigram_filter()])
        terms, _ = an.analyze("データベース検索")
        assert terms == ["デー", "ータ", "タベ", "ベー", "ース", "ス検", "検索"]

    def test_lone_katakana_token_still_bigrams(self):
        an = CustomAnalyzer([cjk_bigram_filter()])
        terms, _ = an.analyze("one データ two")
        assert terms == ["one", "デー", "ータ", "two"]


class TestWordDelimiterGraph:
    """WordDelimiterGraphFilter goldens — examples straight from the
    reference javadoc (WordDelimiterGraphFilter.java:40-100) rendered
    to flat indexed positions (posInc semantics: catenations land at
    their run's start position)."""

    @staticmethod
    def run(f, toks):
        return f(list(toks), list(range(len(toks))))

    def test_case_split(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter()
        assert self.run(f, ["PowerShot"]) == (["Power", "Shot"], [0, 1])

    def test_no_case_split_flag(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter(split_on_case_change=False)
        assert self.run(f, ["PowerShot"]) == (["PowerShot"], [0])
        # "Power-Shot" remains two parts regardless (iterator javadoc:106)
        assert self.run(f, ["Power-Shot"]) == (["Power", "Shot"], [0, 1])

    def test_possessive_and_numerics(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter()
        assert self.run(f, ["O'Neil's"]) == (["O", "Neil"], [0, 1])
        assert self.run(f, ["j2se"]) == (["j", "2", "se"], [0, 1, 2])
        assert self.run(f, ["snake_case_name"]) == (
            ["snake", "case", "name"], [0, 1, 2])

    def test_catenate_words(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter(catenate_words=True)
        assert self.run(f, ["PowerShot"]) == (
            ["PowerShot", "Power", "Shot"], [0, 0, 1])
        # javadoc: "A's+B's&C's" -> A B C + ABC
        assert self.run(f, ["A's+B's&C's"]) == (
            ["ABC", "A", "B", "C"], [0, 0, 1, 2])
        # javadoc: Super-Duper-XL500-42-AutoCoder!
        terms, pos = self.run(f, ["Super-Duper-XL500-42-AutoCoder!"])
        assert terms == ["SuperDuperXL", "Super", "Duper", "XL", "500",
                         "42", "AutoCoder", "Auto", "Coder"]
        assert pos == [0, 0, 1, 2, 3, 4, 5, 5, 6]

    def test_catenate_all_and_preserve(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter(catenate_all=True)
        assert self.run(f, ["wi-fi-4000"]) == (
            ["wifi4000", "wi", "fi", "4000"], [0, 0, 1, 2])
        fp = word_delimiter_graph_filter(preserve_original=True)
        assert self.run(fp, ["500-42"]) == (
            ["500-42", "500", "42"], [0, 0, 1])

    def test_protected_and_holes(self):
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter(
            protected_words=frozenset(["wi-fi"]))
        assert self.run(f, ["wi-fi"]) == (["wi-fi"], [0])
        # pure-delimiter token swallowed, leaving a position hole
        assert self.run(f, ["foo", "++", "bar"]) == (["foo", "bar"], [0, 2])
        # leading/trailing delimiters trimmed, single subword kept
        assert self.run(f, ["-foo-"]) == (["foo"], [0])

    def test_position_shift_downstream(self):
        """Subword expansion shifts later tokens' positions (graph
        positions are real positions)."""
        from lucene_solr_spark.analysis.filters import word_delimiter_graph_filter
        f = word_delimiter_graph_filter()
        terms, pos = self.run(f, ["getFooBar", "baz"])
        assert terms == ["get", "Foo", "Bar", "baz"]
        assert pos == [0, 1, 2, 3]

    def test_whitespace_wdgf_analyzer_end_to_end(self):
        """whitespace -> WDGF -> lowercase, the reference-recommended
        chain: camelCase identifiers match subword queries, and phrase
        positions line up."""
        from lucene_solr_spark.analysis.filters import (
            CustomAnalyzer, lowercase_filter, word_delimiter_graph_filter)
        from lucene_solr_spark.analysis.tokenizer import whitespace_tokenize
        from lucene_solr_spark.oracle import OracleIndex
        from lucene_solr_spark.search.queries import PhraseQuery, TermQuery

        an = CustomAnalyzer(
            [word_delimiter_graph_filter(catenate_words=True),
             lowercase_filter],
            tokenizer=whitespace_tokenize, lowercase=False)
        idx = OracleIndex(analyzer=an)
        idx.add("public int getWidgetCount() { return widget_count; }")
        idx.add("void resetAll() {}")
        idx.add("plain words only")
        hits = idx.search(TermQuery("widget"), 10)
        assert sorted(h.docid for h in hits) == [0]
        # catenation makes the smushed form searchable too
        hits = idx.search(TermQuery("widgetcount"), 10)
        assert [h.docid for h in hits] == [0]
        # subword positions are consecutive -> phrase match
        hits = idx.search(PhraseQuery(["widget", "count"]), 10)
        assert [h.docid for h in hits] == [0]

    def test_whitespace_tokenizer(self):
        from lucene_solr_spark.analysis.tokenizer import whitespace_tokenize
        assert whitespace_tokenize("foo  bar\tbaz\nqux") == [
            "foo", "bar", "baz", "qux"]
        assert whitespace_tokenize("a-b.c") == ["a-b.c"]


def test_delimited_payload_filter():
    from lucene_solr_spark.analysis.filters import (
        delimited_payload_filter,
        extract_payloads,
    )

    f = delimited_payload_filter()
    terms, pos = f(["the|0.1", "quick|2.5", "fox"], [0, 1, 2])
    assert terms == ["the", "quick", "fox"] and pos == [0, 1, 2]
    t, p = extract_payloads(["the|0.1", "fox", "bad|x"])
    assert t == ["the", "fox", "bad"]
    assert p == [0.1, 1.0, 1.0]


def test_keep_limit_truncate_decimal_capture():
    from lucene_solr_spark.analysis.filters import (
        decimal_digit_filter,
        keep_word_filter,
        limit_token_count_filter,
        pattern_capture_group_filter,
        truncate_filter,
    )

    t, p = keep_word_filter({"spark", "flink"})(
        ["spark", "beam", "flink"], [0, 1, 2])
    assert (t, p) == (["spark", "flink"], [0, 2])   # position gap kept
    t, p = keep_word_filter({"spark"}, lower_case=True)(["SPARK"], [0])
    assert t == ["SPARK"]

    assert limit_token_count_filter(2)(["a", "b", "c"], [0, 1, 2]) == (
        ["a", "b"], [0, 1])

    assert truncate_filter(3)(["abcdef", "ab"], [0, 1]) == (
        ["abc", "ab"], [0, 1])

    # Arabic-Indic ٣ = 3, Devanagari ७ = 7, fullwidth ５ = 5
    t, _ = decimal_digit_filter(["a٣b७５"], [0])
    assert t == ["a3b75"]

    # capture groups stack at the original position; original kept
    f = pattern_capture_group_filter([r"([a-z]+)"], preserve_original=True)
    t, p = f(["camelCase"], [5])
    assert t == ["camelCase", "camel", "ase"] and p == [5, 5, 5]
    f2 = pattern_capture_group_filter([r"(\d+)"], preserve_original=False)
    t2, p2 = f2(["abc123def45", "plain"], [0, 1])
    assert t2 == ["123", "45", "plain"] and p2 == [0, 0, 1]


class TestAnalyzeStages:
    """FieldAnalysisRequestHandler role: per-stage token trace."""

    def test_stage_trace_shapes(self):
        from lucene_solr_spark.analysis.filters import (
            CustomAnalyzer, porter_stem_filter, stop_filter)
        from lucene_solr_spark.analysis.tokenizer import ENGLISH_STOP_WORDS

        an = CustomAnalyzer([stop_filter(ENGLISH_STOP_WORDS),
                             porter_stem_filter])
        stages = an.analyze_stages("The Running Dogs")
        names = [n for n, _ in stages]
        assert names[0].startswith("tokenizer:")
        assert names[1] == "filter:lowercase"
        assert len(stages) == 4
        # tokenizer stage keeps original case; lowercase stage folds
        assert [t for t, _ in stages[0][1]] == ["The", "Running", "Dogs"]
        assert [t for t, _ in stages[1][1]] == ["the", "running", "dogs"]
        # stop stage eats 'the' but keeps downstream positions gapped
        stop_terms = stages[2][1]
        assert [t for t, _ in stop_terms] == ["running", "dogs"]
        assert [p for _, p in stop_terms] == [1, 2]
        # final stage equals analyze()
        final = stages[-1][1]
        terms, positions = an.analyze("The Running Dogs")
        assert final == list(zip(terms, positions))
        assert terms == ["run", "dog"]

    def test_char_filter_stage(self):
        from lucene_solr_spark.analysis.charfilters import html_strip
        from lucene_solr_spark.analysis.filters import CustomAnalyzer

        an = CustomAnalyzer(char_filters=[html_strip])
        stages = an.analyze_stages("<b>big</b> table")
        assert stages[0][0].startswith("charfilter:")
        assert "<b>" not in stages[0][1][0][0]
        assert [t for t, _ in stages[-1][1]] == ["big", "table"]
