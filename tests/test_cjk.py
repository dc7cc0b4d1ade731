"""CJK analysis chain: CJKWidthFilter / CJKBigramFilter / CJKAnalyzer
(cjk/CJKWidthFilter.java, cjk/CJKBigramFilter.java, cjk/CJKAnalyzer.java)."""

from lucene_solr_spark.analysis.cjk import (
    ALL_CJK,
    HAN,
    CJKAnalyzer,
    cjk_bigrams,
    cjk_width_fold,
)
from lucene_solr_spark.analysis.tokenizer import standard_tokenize_full
from lucene_solr_spark.oracle.engine import OracleIndex
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery


# ---------------------------------------------------------------- width
def test_width_fullwidth_ascii():
    assert cjk_width_fold("Ｔｅｓｔ１２３") == "Test123"


def test_width_halfwidth_katakana_combining():
    # ﾃ + ﾞ composes to デ; ｰ maps to the prolonged sound mark
    assert cjk_width_fold("ﾃﾞｰﾀ") == "データ"
    # semi-voiced: ﾊ + ﾟ → パ
    assert cjk_width_fold("ﾊﾟﾝ") == "パン"


def test_width_lone_voiced_mark_falls_back():
    # ｱ has no composed voiced form → mark kept standalone (U+3099)
    assert cjk_width_fold("ｱﾞ") == "ア゙"
    # leading mark with nothing to combine with
    assert cjk_width_fold("ﾞx") == "゙x"


# --------------------------------------------------------------- bigram
def _toks(text):
    return standard_tokenize_full(text)


def test_bigram_han_run():
    out = cjk_bigrams(_toks("中国語"))
    assert [(t, p) for t, _ty, p in out] == [("中国", 0), ("国語", 1)]
    assert all(ty == "<DOUBLE>" for _t, ty, _p in out)


def test_bigram_space_breaks_run():
    # offsets unaligned across the space → two lone unigrams
    out = cjk_bigrams(_toks("中 国"))
    assert [(t, ty) for t, ty, _p in out] == [("中", "<SINGLE>"), ("国", "<SINGLE>")]


def test_bigram_passthrough_and_lone_unigram():
    out = cjk_bigrams(_toks("abc 中 def"))
    assert [(t, ty, p) for t, ty, p in out] == [
        ("abc", "<ALPHANUM>", 0),
        ("中", "<SINGLE>", 1),
        ("def", "<ALPHANUM>", 2),
    ]


def test_bigram_katakana_run_token_decomposed():
    # a multi-char KATAKANA token is bigrammed per codepoint
    out = cjk_bigrams(_toks("データ"))
    assert [t for t, _ty, _p in out] == ["デー", "ータ"]


def test_bigram_flags_disable_script():
    # HAN-only: katakana passes through whole
    out = cjk_bigrams(_toks("中国 データ"), flags=HAN)
    assert [t for t, _ty, _p in out] == ["中国", "データ"]


def test_bigram_output_unigrams_stacking():
    out = cjk_bigrams(_toks("中国語"), flags=ALL_CJK, output_unigrams=True)
    # A, AB, B, BC, C with bigrams stacked at the first unigram's position
    assert [(t, p) for t, _ty, p in out] == [
        ("中", 0), ("中国", 0), ("国", 1), ("国語", 1), ("語", 2),
    ]


def test_bigram_mixed_script_run_chains():
    # hiragana directly adjacent to han chains into one run
    # (CJKBigramFilter only breaks on unaligned offsets / non-CJK)
    out = cjk_bigrams(_toks("日本ごが"))
    assert [t for t, _ty, _p in out] == ["日本", "本ご", "ごが"]


# ------------------------------------------------------------- analyzer
def test_cjk_analyzer_end_to_end():
    a = CJKAnalyzer()
    terms, positions = a.analyze("Ｔｏｋｙｏの天気")
    # fullwidth latin folded+lowered, の bridges the CJK run
    assert terms == ["tokyo", "の天", "天気"]
    assert positions == [0, 1, 2]


def test_cjk_analyzer_search_identity():
    """Bigrammed index + bigrammed query = substring-style CJK match."""
    idx = OracleIndex(analyzer=CJKAnalyzer())
    docs = ["東京の天気は晴れ", "大阪の天気", "東京タワー", "nothing here"]
    for d in docs:
        idx.add(d)
    # query "天気" analyzes to the single bigram 天気 → docs 0 and 1
    qterms, _ = CJKAnalyzer().analyze("天気")
    q = BooleanQuery.of(must=[TermQuery(t) for t in qterms])
    hits = idx.search(q, 10)
    assert sorted(h.docid for h in hits) == [0, 1]
    # "東京タ" spans the han→katakana boundary: bigrams 東京, 京タ
    qterms2, _ = CJKAnalyzer().analyze("東京タ")
    q2 = BooleanQuery.of(must=[TermQuery(t) for t in qterms2])
    assert [h.docid for h in idx.search(q2, 10)] == [2]


# ---------------------------------------------------------- icu folding
def test_icu_folding():
    from lucene_solr_spark.analysis.filters import CustomAnalyzer, icu_fold, icu_folding_filter

    assert icu_fold("Café") == "cafe"
    assert icu_fold("straße") == "strasse"
    assert icu_fold("Ⅻ") == "xii"          # compatibility numeral
    assert icu_fold("ﬁne") == "fine"        # ligature expansion
    assert icu_fold("ＡＢＣ１２３") == "abc123"  # width folding
    assert icu_fold("x²") == "x2"            # superscript folding
    assert icu_fold("a​b‍c") == "abc"  # default ignorables
    # Indic matra (ccc=0 vowel sign) must survive the diacritic strip
    assert icu_fold("कि") == "कि"
    an = CustomAnalyzer([icu_folding_filter])
    terms, _ = an.analyze("Über Straße ﬁne")
    assert terms == ["uber", "strasse", "fine"]


# --------------------------------------------------------- tokenizer zoo
def test_keyword_and_letter_tokenizers():
    from lucene_solr_spark.analysis.tokenizer import keyword_tokenize, letter_tokenize

    assert keyword_tokenize("Hello World 42") == ["Hello World 42"]
    assert keyword_tokenize("") == []
    assert letter_tokenize("abc123def gh_i j'k") == ["abc", "def", "gh", "i", "j", "k"]


def test_url_email_tokenizer():
    from lucene_solr_spark.analysis.tokenizer import (
        uax29_url_email_tokenize,
        uax29_url_email_tokenize_typed,
    )

    toks = uax29_url_email_tokenize_typed(
        "see https://example.com/a?b=1 or mail bob.smith@corp.example.org now."
    )
    d = dict(toks)
    assert d["https://example.com/a?b=1"] == "<URL>"
    assert d["bob.smith@corp.example.org"] == "<EMAIL>"
    assert d["see"] == "<ALPHANUM>" and d["now"] == "<ALPHANUM>"
    # trailing sentence punctuation is not swallowed into the URL
    toks2 = uax29_url_email_tokenize("go to www.example.com.")
    assert "www.example.com" in toks2 and "www.example.com." not in toks2
    # plain text still standard-tokenizes (foo.bar stays one token)
    assert uax29_url_email_tokenize("foo.bar baz") == ["foo.bar", "baz"]


def test_url_email_analyzer_chain():
    from lucene_solr_spark.analysis.filters import CustomAnalyzer
    from lucene_solr_spark.analysis.tokenizer import uax29_url_email_tokenize

    an = CustomAnalyzer(tokenizer=uax29_url_email_tokenize)
    terms, _ = an.analyze("Visit HTTPS://EXAMPLE.COM/Path today")
    # lowercased downstream like any token
    assert "https://example.com/path" in terms and "today" in terms


def test_pattern_tokenizer():
    from lucene_solr_spark.analysis.tokenizer import pattern_tokenizer

    split = pattern_tokenizer(r"[;,]\s*")          # delimiter mode
    assert split("a; b,c;; d") == ["a", "b", "c", "d"]
    grab = pattern_tokenizer(r"'([^']+)'", group=1)  # group mode
    assert grab("say 'hello' and 'bye'") == ["hello", "bye"]


def test_path_hierarchy_tokenizer():
    """Goldens from TestPathHierarchyTokenizer / TestReversePath...java."""
    from lucene_solr_spark.analysis.tokenizer import path_hierarchy_tokenizer as P

    assert P()("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
    assert P()("/a/b/c/") == ["/a", "/a/b", "/a/b/c", "/a/b/c/"]
    assert P()("a/b/c") == ["a", "a/b", "a/b/c"]
    assert P(skip=1)("/a/b/c") == ["/b", "/b/c"]
    assert P(skip=1)("a/b/c") == ["/b", "/b/c"]
    assert P(skip=1)("/") == []
    assert P(skip=1)("//") == ["/"]
    assert P(reverse=True)("/a/b/c") == ["/a/b/c", "a/b/c", "b/c", "c"]
    assert P(reverse=True)("a/b/c/") == ["a/b/c/", "b/c/", "c/"]
    assert P(reverse=True, skip=1)("/a/b/c/") == ["/a/b/", "a/b/", "b/"]
    assert P(reverse=True, skip=1)("a/b/c") == ["a/b/", "b/"]
    # domain-style suffix hierarchy + replacement delimiter
    rev = P(delimiter=".", reverse=True)
    assert rev("www.example.com") == ["www.example.com", "example.com", "com"]
    assert P(replacement="|")("a/b") == ["a", "a|b"]


def test_tokenize_column_swappable(spark):
    from lucene_solr_spark.analysis.filters import porter_stem_filter, tokenize_column
    from lucene_solr_spark.analysis.tokenizer import (
        path_hierarchy_tokenizer,
        uax29_url_email_tokenize,
    )

    df = spark.createDataFrame(
        [(0, "Running tests at https://example.com/x", "/a/b/c")],
        "id long, content string, path string",
    )
    out = tokenize_column(df, tokenizer=uax29_url_email_tokenize,
                          chain=[porter_stem_filter]).collect()[0]["tokens"]
    assert "https://example.com/x" in out and "run" in out and "test" in out
    out2 = tokenize_column(df, text_col="path", out_col="ancestors",
                           tokenizer=path_hierarchy_tokenizer(),
                           lowercase=False).collect()[0]["ancestors"]
    assert out2 == ["/a", "/a/b", "/a/b/c"]


def test_protected_stem_trim_reverse_filters():
    from lucene_solr_spark.analysis.filters import (
        CustomAnalyzer,
        protected_stem_filter,
        reverse_string_filter,
        trim_filter,
    )

    an = CustomAnalyzer([protected_stem_filter(
        keywords=frozenset({"running"}), overrides={"mice": "mouse"})])
    terms, _ = an.analyze("running racing mice maximum")
    # 'running' protected, 'mice' overridden, rest Porter-stemmed
    assert terms == ["running", "race", "mouse", "maximum"]

    # trim: pattern tokenizer can emit padded tokens; empties leave gaps
    t, p = trim_filter(["  a ", "b", "   "], [0, 1, 2])
    assert (t, p) == (["a", "b"], [0, 1])

    # reverse: the leading-wildcard trick — *fix becomes a prefix scan
    t, _ = reverse_string_filter(["suffix", "ab"], [0, 1])
    assert t == ["xiffus", "ba"]


def test_common_grams_filter():
    from lucene_solr_spark.analysis.filters import CustomAnalyzer, common_grams_filter

    common = frozenset({"the", "in"})
    an = CustomAnalyzer([common_grams_filter(common)])
    terms, pos = an.analyze("the rain in spain falls")
    # unigrams all kept; bigrams stacked at first member's position
    assert list(zip(terms, pos)) == [
        ("the", 0), ("the_rain", 0), ("rain", 1), ("rain_in", 1),
        ("in", 2), ("in_spain", 2), ("spain", 3), ("falls", 4)]
    # query mode: grams + only uncovered unigrams (reference javadoc ex.)
    anq = CustomAnalyzer([common_grams_filter(common, query_mode=True)])
    qt, qp = anq.analyze("the rain in spain falls mainly")
    assert qt == ["the_rain", "rain_in", "in_spain", "falls", "mainly"]
    assert qp == list(range(5))


def test_elision_and_keyword_repeat():
    from lucene_solr_spark.analysis.filters import (
        CustomAnalyzer,
        elision_filter,
        keyword_repeat_stem_filter,
    )

    an = CustomAnalyzer([elision_filter()])
    terms, _ = an.analyze("l'avion d'été qu'il mange")
    assert terms == ["avion", "été", "il", "mange"]

    an2 = CustomAnalyzer([keyword_repeat_stem_filter()])
    terms2, pos2 = an2.analyze("running fox")
    # original + stacked stem; no-op stems don't duplicate
    assert list(zip(terms2, pos2)) == [("running", 0), ("run", 0), ("fox", 1)]


def test_query_from_analysis_shapes():
    """QueryBuilder.createFieldQuery: analyzer output shape decides the
    query class, stacked tokens → Synonym/MultiPhrase."""
    from lucene_solr_spark.analysis.filters import (
        CustomAnalyzer,
        keyword_repeat_stem_filter,
        stop_filter,
    )
    from lucene_solr_spark.search.parser import query_from_analysis
    from lucene_solr_spark.search.queries import (
        MatchNoDocsQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SynonymQuery,
        TermQuery,
    )

    plain = CustomAnalyzer()
    assert query_from_analysis(plain, "hello") == TermQuery("hello")
    q = query_from_analysis(plain, "hello world")
    assert isinstance(q, PhraseQuery) and q.terms == ("hello", "world")
    # stop gap survives into the phrase positions
    gap = CustomAnalyzer([stop_filter(frozenset({"the"}))])
    q2 = query_from_analysis(gap, "over the moon")
    assert isinstance(q2, PhraseQuery) and q2.positions == (0, 2)
    # one position, stacked → SynonymQuery
    rep = CustomAnalyzer([keyword_repeat_stem_filter()])
    q3 = query_from_analysis(rep, "running")
    assert isinstance(q3, SynonymQuery) and set(q3.terms) == {"running", "run"}
    # many positions, stacking → MultiPhraseQuery with per-slot options
    q4 = query_from_analysis(rep, "running fox")
    assert isinstance(q4, MultiPhraseQuery)
    assert q4.termss == (("running", "run"), ("fox",))
    # everything analyzed away
    assert isinstance(query_from_analysis(gap, "the"), MatchNoDocsQuery)


def test_fingerprint_and_preserve_folding():
    from lucene_solr_spark.analysis.filters import (
        CustomAnalyzer,
        ascii_folding_preserve_filter,
        fingerprint_filter,
    )

    an = CustomAnalyzer([fingerprint_filter()])
    terms, pos = an.analyze("the quick the brown quick")
    assert (terms, pos) == (["brown quick the"], [0])
    assert CustomAnalyzer([fingerprint_filter(max_output_token_size=5)]
                          ).analyze("alpha beta") == ([], [])

    an2 = CustomAnalyzer([ascii_folding_preserve_filter])
    terms2, pos2 = an2.analyze("café bar")
    # folded first, original stacked; unchanged tokens not duplicated
    assert list(zip(terms2, pos2)) == [("cafe", 0), ("café", 0), ("bar", 1)]
