"""Hunspell dictionary stemming (analysis/hunspell/Dictionary.java +
Stemmer.java + HunspellStemFilter.java roles) over inline .aff/.dic
fixtures shaped like the module's own test dictionaries."""

from lucene_solr_spark.analysis.hunspell import (
    HunspellDictionary,
    hunspell_stem_filter,
)
from lucene_solr_spark.analysis.filters import CustomAnalyzer

AFF = """
SET UTF-8
TRY esianrtolcdugmphbyfvkwzESIANRTOLCDUGMPHBYFVKWZ'

PFX R Y 1
PFX R 0 re .

SFX S Y 3
SFX S 0 s [^sy]
SFX S 0 es [sxz]
SFX S y ies [^aeiou]y

SFX D Y 2
SFX D 0 ed [^e]
SFX D 0 d e

SFX N Y 1
SFX N 0 ness/S .
"""

DIC = """6
book/S
walk/SDR
fly/S
dance/SD
kind/N
ski
"""


def _dict():
    return HunspellDictionary(AFF, DIC)


def test_exact_and_plural():
    d = _dict()
    assert d.stem("book") == ["book"]
    assert d.stem("books") == ["book"]
    assert d.stem("ski") == ["ski"]
    assert "ski" not in d.stem("skis")  # ski carries no S flag


def test_condition_and_strip():
    d = _dict()
    # SFX S: y→ies only after consonant+y
    assert d.stem("flies") == ["fly"]
    assert d.stem("flys") == []       # blocked by the [^sy] condition
    # SFX D: e-final words take bare 'd'
    assert d.stem("danced") == ["dance"]
    assert d.stem("walked") == ["walk"]


def test_prefix_and_cross_product():
    d = _dict()
    assert d.stem("rewalk") == ["walk"]
    # cross product: prefix + suffix together, entry has both flags
    assert d.stem("rewalked") == ["walk"]
    # book has no R flag: prefixed form must not resolve
    assert d.stem("rebook") == []


def test_twofold_suffix_chain():
    d = _dict()
    # kind/N → kindness (N), whose append carries /S → kindnesses
    assert d.stem("kindness") == ["kind"]
    assert d.stem("kindnesses") == ["kind"]


def test_flag_modes():
    aff = "FLAG long\nSFX AA Y 1\nSFX AA 0 s .\n"
    dic = "1\ncat/AA\n"
    d = HunspellDictionary(aff, dic)
    assert d.stem("cats") == ["cat"]
    aff_num = "FLAG num\nSFX 501 Y 1\nSFX 501 0 s .\n"
    dic_num = "1\ncat/501\n"
    d2 = HunspellDictionary(aff_num, dic_num)
    assert d2.stem("cats") == ["cat"]


def test_filter_and_analyzer():
    d = _dict()
    f = hunspell_stem_filter(d)
    terms, pos = f(["walked", "quickly"], [0, 1])
    assert terms == ["walk", "quickly"] and pos == [0, 1]
    # ambiguous forms stack all stems at one position
    aff = "SFX S Y 1\nSFX S 0 s .\n"
    dic = "2\nbus/S\nbu/S\n"
    amb = HunspellDictionary(aff, dic)
    f2 = hunspell_stem_filter(amb)
    terms2, pos2 = f2(["bus"], [0])
    assert set(terms2) == {"bus", "bu"} and pos2 == [0, 0]
    f3 = hunspell_stem_filter(amb, longest_only=True)
    assert f3(["bus"], [0])[0] == ["bus"]
    an = CustomAnalyzer(filters=[hunspell_stem_filter(d)])
    assert an.analyze("she rewalked the flies")[0] == \
        ["she", "walk", "the", "fly"]
