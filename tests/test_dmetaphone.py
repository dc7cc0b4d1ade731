"""Double Metaphone encoder + filter
(analysis/phonetic/DoubleMetaphoneFilter.java role). Goldens are the
widely-published outputs of Philips' reference implementation."""

from lucene_solr_spark.analysis.dmetaphone import (
    double_metaphone as dm,
    double_metaphone_filter,
)
from lucene_solr_spark.analysis.filters import CustomAnalyzer


def test_headline_pairs():
    # the motivating anglicization pair: meets on XMT
    assert dm("Smith") == ("SM0", "XMT")
    assert dm("Schmidt") == ("XMT", "SMT")
    assert dm("Smith")[1] == dm("Schmidt")[0]
    # spelling variants collapse on the primary
    assert dm("Katherine") == dm("Catherine") == ("K0RN", "KTRN")
    assert dm("Wasserman")[1] == dm("Vasserman")[0] == "FSRM"


def test_letter_rules():
    assert dm("Jose") == ("HS", "HS")            # Spanish J
    assert dm("san jose")[0] == "SNHS"
    assert dm("Thomas") == ("TMS", "TMS")        # TH before OM → T
    assert dm("Thumb") == ("0M", "TM")           # TH → 0/T, silent MB
    assert dm("Knight") == ("NT", "NT")          # silent start + silent GH
    assert dm("ghost") == ("KST", "KST")         # initial GH → K
    assert dm("laugh")[0] == "LF"                # -UGH after L → F
    assert dm("island") == ("ALNT", "ALNT")      # silent S in ISL
    assert dm("sugar") == ("XKR", "SKR")
    assert dm("Caesar")[0] == "SSR"
    assert dm("edge") == ("AJ", "AJ")            # DGE → J
    assert dm("Edgar")[0] == "ATKR"              # DGA → TK
    assert dm("school")[0] == "SKL"              # SCH before vowel
    assert dm("Michael") == ("MKL", "MXL")       # CHAE
    assert dm("McHugh")[0] == "MK"               # MC prefix hardens CH
    assert dm("focaccia")[0] == "FKX"            # CCI → X
    assert dm("accident")[0] == "AKST"           # UCCE/ACC → KS
    assert dm("breaux")[0] == "PR"               # French silent final X
    assert dm("Zhao")[0] == "J"


def test_slavic_and_ambiguity():
    assert dm("Jablonski") == ("JPLN", "APLN")   # initial J → J/A
    assert dm("Williams") == ("ALMS", "FLMS")    # initial W+vowel → A/F
    assert dm("filipowicz") == ("FLPT", "FLPF")  # -WICZ → TS/FX
    assert dm("Czerny") == ("SRN", "XRN")        # CZ → S/X
    assert dm("cabrillo") == ("KPRL", "KPR")     # Spanish LL: alt drops
    assert dm("Xavier") == ("SF", "SFR")         # French -IER final R
    assert dm("Tagliaro") == ("TKLR", "TLR")     # Italian GLI


def test_shape_and_edges():
    assert dm("") == ("", "")
    assert dm("a") == ("A", "A")
    p, a = dm("Schwarzenegger")
    assert len(p) <= 4 and len(a) <= 4
    assert dm("SMITH") == dm("smith")            # case-insensitive
    p8, _ = dm("Schwarzenegger", max_code_len=8)
    assert p8.startswith(p) and len(p8) > 4      # cap is a parameter


def test_filter_injects_primary_and_alternate():
    f = double_metaphone_filter(inject=True)
    terms, pos = f(["smith"], [0])
    assert terms == ["smith", "sm0", "xmt"] and pos == [0, 0, 0]
    f2 = double_metaphone_filter(inject=False)
    terms2, pos2 = f2(["smith", "schmidt"], [0, 1])
    assert terms2 == ["sm0", "xmt", "xmt", "smt"]
    assert pos2 == [0, 0, 1, 1]


def test_in_analyzer_variants_meet():
    an = CustomAnalyzer(filters=[double_metaphone_filter(inject=True)])
    t1, _ = an.analyze("mr smith")
    t2, _ = an.analyze("mr schmidt")
    assert set(t1) & set(t2) >= {"mr", "xmt"}
