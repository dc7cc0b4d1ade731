"""Daitch–Mokotoff Soundex (DaitchMokotoffSoundexFilter.java role).
Goldens are the published Avotaynu/JewishGen worked examples."""

from lucene_solr_spark.analysis.dmsoundex import (
    daitch_mokotoff as dm,
    dm_soundex_filter,
)
from lucene_solr_spark.analysis.filters import CustomAnalyzer


def test_single_code_goldens():
    assert dm("GOLDEN") == ("583600",)
    assert dm("Augsburg") == ("054795",)
    assert dm("Breuer") == ("791900",)     # EU before a vowel → 1
    assert dm("Mannheim") == ("665600",)   # NN collapses, 6-vowel-6 kept
    assert dm("Berlin") == ("798600",)
    assert dm("Moskowitz") == ("645740",)
    assert dm("Kleinman") == ("586660",)


def test_branching_goldens():
    # RS reads as R-S or as the Polish RZ sound
    assert set(dm("Halberstadt")) == {"587943", "587433"}
    assert set(dm("Peters")) == {"739400", "734000"}
    # CH reads as KH or TCH
    assert set(dm("Chelm")) == {"586000", "486000"}
    assert set(dm("Auerbach")) == {"097500", "097400"}


def test_matching_pairs():
    # the pairs the algorithm was designed to unify
    assert set(dm("Auerbach")) & set(dm("Ohrbach"))
    assert set(dm("Lipshitz")) == set(dm("Lipschitz")) == {"874400"}
    assert set(dm("Szlamawicz")) == set(dm("Shlamovitz")) == {"486740"}
    assert set(dm("Ceniow")) & set(dm("Tsenyuv")) == {"467000"}
    assert set(dm("Holubica")) & set(dm("Golubitsa")) == {"587400"}


def test_shape_and_edges():
    assert dm("") == ()
    assert dm("a") == ("000000",)
    assert all(len(c) == 6 and c.isdigit() for c in dm("Schwarzenegger"))
    assert dm("MOSKOWITZ") == dm("moskowitz")
    # branch count stays bounded on pathological input
    assert len(dm("chchchchchchchch")) <= 16


def test_filter_stacks_all_codes():
    f = dm_soundex_filter(inject=True)
    terms, pos = f(["chelm"], [3])
    assert terms == ["chelm", "586000", "486000"] and pos == [3, 3, 3]
    f2 = dm_soundex_filter(inject=False)
    terms2, pos2 = f2(["berlin"], [0])
    assert terms2 == ["798600"] and pos2 == [0]


def test_in_analyzer_surname_variants_meet():
    an = CustomAnalyzer(filters=[dm_soundex_filter(inject=True)])
    t1, _ = an.analyze("mrs lipshitz")
    t2, _ = an.analyze("mrs lipschitz")
    assert set(t1) & set(t2) >= {"mrs", "874400"}
