"""Phonetic encoders/filter and the TermsComponent enumeration."""

from __future__ import annotations

import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
from lucene_solr_spark.analysis.filters import CustomAnalyzer
from lucene_solr_spark.analysis.phonetic import (
    phonetic_filter,
    refined_soundex,
    soundex,
)
from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.index import build_index
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher


def test_soundex_goldens():
    # commons-codec Soundex test vectors (incl. the H/W transparency
    # cases the naive algorithm gets wrong)
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"
    assert soundex("") == ""
    assert soundex("123") == ""
    assert soundex("a") == "A000"


def test_refined_soundex_goldens():
    # commons-codec RefinedSoundex vectors
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    assert refined_soundex("The") == "T60"
    assert refined_soundex("quick") == "Q503"
    assert refined_soundex("brown") == "B1908"
    assert refined_soundex("fox") == "F205"


def test_phonetic_filter_inject():
    f = phonetic_filter(soundex, inject=True)
    terms, pos = f(["robert", "x1"], [0, 1])
    # code stacks at the SAME position (posInc=0 injection)
    assert terms == ["robert", "r163", "x1", "x000"]
    assert pos == [0, 0, 1, 1]


def test_phonetic_filter_replace():
    f = phonetic_filter(soundex, inject=False)
    terms, pos = f(["robert", "rupert"], [0, 3])
    assert terms == ["r163", "r163"]
    assert pos == [0, 3]


def test_phonetic_in_analyzer_matches_variants():
    an = CustomAnalyzer(filters=[phonetic_filter(soundex, inject=False)])
    assert an.terms("Robert") == an.terms("Rupert")
    assert an.terms("Ashcraft") == an.terms("Ashcroft")


# ---- TermsComponent --------------------------------------------------------

@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_terms"))
    corpus = corpus_df(spark, 80, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    return IndexSearcher(tables, cache=True)


def test_terms_enum_prefix_and_sorts(searcher):
    rows = C.terms_enum(searcher, prefix="get", limit=5).collect()
    assert rows, "corpus has get* identifiers"
    assert all(r["term"].startswith("get") for r in rows)
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)

    by_index = C.terms_enum(searcher, prefix="get", limit=5,
                            sort="index").collect()
    terms = [r["term"] for r in by_index]
    assert terms == sorted(terms)


def test_terms_enum_regex_and_mincount(searcher):
    rows = C.terms_enum(searcher, regex="^scaned[0-9]+$", limit=10,
                        min_count=2).collect()
    assert rows
    assert all(r["count"] >= 2 for r in rows)
    # df sanity: count equals the dict's df for that term
    d = {r["term"]: r["count"] for r in rows}
    dict_rows = searcher.dict.where(
        searcher.dict["term"].isin(*d)).select("term", "df").collect()
    assert {r["term"]: r["df"] for r in dict_rows} == d
