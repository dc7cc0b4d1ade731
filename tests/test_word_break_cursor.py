"""WordBreakSpellChecker (search/word_break.py) and cursorMark deep
paging (components.cursor_page) vs brute-force oracles."""

import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery
from lucene_solr_spark.search.word_break import (
    suggest_word_breaks,
    suggest_word_combinations,
)

N_DOCS = 100


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_wb"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


def _brute_breaks(oracle, word, max_changes=1, min_freq=1):
    """Direct port of generateBreakUpSuggestions + LengthThenMaxFreq
    ordering, against the pure-Python oracle's dfs."""
    out = []

    def rec(text, nb, prefix):
        for i in range(1, len(text)):
            left, right = text[:i], text[i:]
            lf = oracle.doc_freq(left)
            if lf < min_freq:
                continue
            rf = oracle.doc_freq(right)
            if rf >= min_freq:
                out.append(prefix + [(left, lf), (right, rf)])
            if nb + 1 <= max_changes:
                rec(right, nb + 1, prefix + [(left, lf)])

    rec(word, 1, [])
    out.sort(key=lambda s: (len(s), -max(f for _w, f in s)))
    return out


def test_break_single(built):
    searcher, oracle = built
    got = suggest_word_breaks(searcher, "intreturn", 5)
    want = _brute_breaks(oracle, "intreturn")[:5]
    assert got and got == want
    assert ["int", "return"] == [w for w, _f in got[0]]


def test_break_recursive_two_changes(built):
    searcher, oracle = built
    got = suggest_word_breaks(searcher, "intwhileclass", 10, max_changes=2)
    want = _brute_breaks(oracle, "intwhileclass", max_changes=2)[:10]
    assert got == want
    assert any([w for w, _f in s] == ["int", "while", "class"] for s in got)


def test_break_in_vocab_word_suppressed(built):
    searcher, oracle = built
    assert oracle.doc_freq("return") > 0
    assert suggest_word_breaks(searcher, "return", 5) == []
    # SUGGEST_ALWAYS ignores the original's presence
    always = suggest_word_breaks(searcher, "return", 5,
                                 suggest_mode="SUGGEST_ALWAYS")
    assert isinstance(always, list)


def test_combine_adjacent(built):
    searcher, oracle = built
    assert oracle.doc_freq("ret") == 0 and oracle.doc_freq("urn") == 0
    got = suggest_word_combinations(searcher, ["ret", "urn"], 5)
    assert got and got[0][0] == "return"
    assert got[0][1] == oracle.doc_freq("return")
    assert got[0][2] == (0, 1)


def test_combine_skips_in_vocab_pairs(built):
    searcher, oracle = built
    # both words indexed → minFreq != 0 → no suggestion in
    # SUGGEST_WHEN_NOT_IN_INDEX (WordBreakSpellChecker.java:222)
    assert oracle.doc_freq("int") > 0 and oracle.doc_freq("return") > 0
    assert suggest_word_combinations(searcher, ["int", "return"], 5) == []


def test_cursor_pages_equal_one_shot(built):
    searcher, _ = built
    q = BooleanQuery.of(should=[TermQuery("return"), TermQuery("class")])
    full = searcher.search(q, 12)
    mark, pages = "*", []
    for _ in range(3):
        docs, mark = C.cursor_page(searcher, q, 4, mark)
        pages.extend(docs)
    assert [(d.docid, d.score) for d in pages] == [
        (d.docid, d.score) for d in full]


def test_cursor_end_repeats_totem(built):
    searcher, _ = built
    q = TermQuery("return")
    mark = "*"
    seen = 0
    for _ in range(200):
        docs, nxt = C.cursor_page(searcher, q, 50, mark)
        seen += len(docs)
        if nxt == mark:
            break
        mark = nxt
    assert nxt == mark               # end-of-results contract
    assert seen == len(searcher.search(q, 10_000))
