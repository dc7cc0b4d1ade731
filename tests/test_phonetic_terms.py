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


# ---------------------------------------------------------------------------
# Round-3 encoder zoo: the remaining PhoneticFilterFactory encoders
# (Metaphone, Nysiis, Caverphone2, ColognePhonetic — commons-codec /
# published-spec semantics). Goldens hand-derived from the published
# rule tables; the spec-document examples are cited inline.

from lucene_solr_spark.analysis.phonetic import (
    metaphone,
    nysiis,
    caverphone2,
    cologne_phonetic,
)


def test_metaphone_initial_clusters():
    # silent initial clusters: KN/GN/PN/WR drop the first letter,
    # X- → S, WH- → W, AE- → E
    assert metaphone("Knight") == "NT"
    assert metaphone("gnome") == "NM"
    assert metaphone("pneumonia")[0] == "N"
    assert metaphone("wright") == "RT"
    assert metaphone("Xavier")[0] == "S"
    assert metaphone("what")[0] == "W"
    assert metaphone("aegis")[0] == "E"


def test_metaphone_rule_table():
    assert metaphone("metaphone") == "MTFN"   # P before H → F
    assert metaphone("testing") == "TSTN"
    assert metaphone("thought") == "0T"       # TH → 0, GH silent
    assert metaphone("judge") == "JJ"         # -DGE- → J
    assert metaphone("school") == "SKL"       # SCH → K
    assert metaphone("station") == "STXN"     # -TIO- → X
    assert metaphone("vision")[1] == "X"      # -SIO- → X (after initial F)
    assert metaphone("lamb") == "LM"          # terminal MB: B silent
    assert metaphone("box") == "BKS"          # X → KS
    assert metaphone("quick") == "KK"         # Q → K, CK collapses
    assert metaphone("cellar") == "SLR"       # C before E → S
    assert metaphone("chair")[0] == "X"       # CH → X
    assert metaphone("science")[:2] == "SN"   # SCI: C dropped


def test_metaphone_cap_and_case():
    assert metaphone("Schwarzenegger", max_code_len=4) == metaphone("schwarzenegger")
    assert len(metaphone("Schwarzenegger")) == 4
    assert metaphone("") == ""
    assert metaphone("a") == "A"


def test_nysiis_goldens():
    # boundary transcodes + body rules; KNIGHT/BISHOP are the
    # widely-published worked examples
    assert nysiis("KNIGHT") == "NAGT"
    assert nysiis("Bishop") == "BASAP"
    assert nysiis("MACINTOSH") == "MCANT"
    assert nysiis("KNUTH") == "NAT"
    # matching variants collide
    assert nysiis("Brian") == nysiis("Brown") == nysiis("Brun") == "BRAN"
    # strict=False removes the 6-char cap
    assert nysiis("Schwarzenegger", strict=False).startswith(nysiis("Schwarzenegger"))


def test_caverphone2_spec_examples():
    # worked examples from the Caverphone 2.0 revision paper
    assert caverphone2("Thompson") == "TMPSN11111"
    assert caverphone2("Stevenson") == "STFNSN1111"
    assert caverphone2("Peter") == "PTA1111111"
    assert len(caverphone2("x")) == 10
    # spelling variants collide
    assert caverphone2("Stephenson") == caverphone2("Stevenson")


def test_cologne_goldens():
    # published worked examples (Postel's table)
    assert cologne_phonetic("Müller-Lüdenscheidt") == "65752682"
    assert cologne_phonetic("Breschnew") == "17863"
    assert cologne_phonetic("Wikipedia") == "3412"
    # the motivating German collision pair
    assert cologne_phonetic("Meyer") == cologne_phonetic("Mair") == "67"
    # terminal D/T is '2' (not the before-C/S/Z '8' branch)
    assert cologne_phonetic("Schmidt").endswith("2")


def test_new_encoders_in_phonetic_filter():
    f = phonetic_filter(metaphone, inject=False)
    terms, pos = f(["knight", "night"], [0, 1])
    assert terms[0] == terms[1] == "nt" and pos == [0, 1]
