"""Interval-facet parser unit tests + membership semantics.

The Spark-vs-DuckDB value hashes for the four solr_extras entries
(interval_facets, unique_block_facet, term_vectors, facet_heatmap)
are driver-gated; here we pin the parser grammar itself
(IntervalFacets.java:359-470 syntax rules) and the contains()
semantics the Column predicates mirror.
"""

import pytest

from lucene_solr_spark.relational.solr_extras import (
    FacetInterval,
    parse_interval,
)


def test_parse_basic_brackets():
    iv = parse_interval("[0,10)")
    assert iv == FacetInterval("[0,10)", 0.0, 10.0, True, False)
    iv = parse_interval("(2.5,7.5]")
    assert iv == FacetInterval("(2.5,7.5]", 2.5, 7.5, False, True)


def test_parse_unbounded_star():
    # `(*` ≡ `[*` and `*)` ≡ `*]`: a star endpoint is always "open
    # to infinity" regardless of bracket (IntervalFacets.java:376-417)
    for spec in ("[*,10)", "(*,10)"):
        iv = parse_interval(spec)
        assert iv.start is None and iv.contains(-1e18)
    for spec in ("[10,*]", "[10,*)"):
        iv = parse_interval(spec)
        assert iv.end is None and iv.contains(1e18)
    both = parse_interval("[*,*]")
    assert both.contains(0.0) and both.contains(-1e18) and both.contains(1e18)


def test_parse_singleton_and_whitespace():
    iv = parse_interval(" [20,20] ")
    assert iv.contains(20.0)
    assert not iv.contains(19.999999) and not iv.contains(20.000001)
    # singleton with an open end matches nothing
    assert not parse_interval("[20,20)").contains(20.0)


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_interval("[10,5]")  # start > end
    with pytest.raises(ValueError):
        parse_interval("10,20")  # no brackets
    with pytest.raises(ValueError):
        parse_interval("[10;20]")  # no comma
    with pytest.raises(ValueError):
        parse_interval("[a,b]")  # non-numeric


def test_contains_boundaries():
    iv = parse_interval("[0,10)")
    assert iv.contains(0.0) and iv.contains(9.999999)
    assert not iv.contains(10.0) and not iv.contains(-0.000001)
    iv = parse_interval("(0,10]")
    assert not iv.contains(0.0) and iv.contains(10.0)


def test_overlapping_intervals_multicount():
    # interval facets are NOT a partition: one value may land in
    # several intervals (IntervalFacets javadoc)
    specs = ["[*,10)", "[10,25)", "[25,*]", "(15,30]", "[20,20]"]
    ivs = [parse_interval(s) for s in specs]
    hits = [iv.raw for iv in ivs if iv.contains(20.0)]
    assert hits == ["[10,25)", "(15,30]", "[20,20]"]
