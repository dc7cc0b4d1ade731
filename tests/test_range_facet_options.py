"""Range-facet option surface (RangeFacetRequest.java:564-650):
include/other/hardend golden vectors."""

from lucene_solr_spark.relational.solr_extras import compute_range_buckets


def _names(bs):
    return [b[0] for b in bs]


def test_default_include_lower():
    bs = compute_range_buckets(0, 20, 10)
    assert [(b[1], b[2], b[3], b[4]) for b in bs] == [
        (0.0, 10.0, True, False), (10.0, 20.0, True, False)]


def test_soft_end_extends_to_whole_gap():
    # end=25 gap=10, hardend=false → end becomes 30 (:581-586)
    bs = compute_range_buckets(0, 25, 10)
    assert [b[2] for b in bs] == [10.0, 20.0, 30.0]


def test_hardend_clips_last_bucket():
    bs = compute_range_buckets(0, 25, 10, hardend=True)
    assert [b[2] for b in bs] == [10.0, 20.0, 25.0]


def test_include_edge_closes_only_outermost():
    bs = compute_range_buckets(0, 30, 10, include=frozenset({"edge"}))
    assert [(b[3], b[4]) for b in bs] == [
        (True, False), (False, False), (False, True)]


def test_other_bounds_complement_gap_buckets():
    # include=lower → before excludes its upper bound? No: before's
    # upper closes only if NOT (lower|edge) or outer (:632-635) —
    # with lower, first gap bucket owns the start, so before is open.
    bs = compute_range_buckets(0, 10, 10, others=frozenset({"all"}))
    d = {b[0]: b for b in bs}
    assert d["before"][4] is False       # upper bound open
    assert d["after"][3] is True         # lower open? include=lower →
    # last gap bucket does NOT own end (upper not in include) → after
    # includes its lower bound (:638-641)
    assert d["between"][3] is True and d["between"][4] is False


def test_include_outer_closes_other_bounds():
    bs = compute_range_buckets(
        0, 10, 10, include=frozenset({"lower", "upper", "outer"}),
        others=frozenset({"all"}))
    d = {b[0]: b for b in bs}
    assert d["before"][4] is True and d["after"][3] is True


def test_include_all_expands():
    bs = compute_range_buckets(0, 10, 10, include=frozenset({"all"}),
                               others=frozenset({"between"}))
    d = {b[0]: b for b in bs}
    assert d["0"][3] is True and d["0"][4] is True
    assert d["between"][3] is True and d["between"][4] is True


def test_other_none_suppresses():
    bs = compute_range_buckets(0, 10, 10,
                               others=frozenset({"none", "before"}))
    assert _names(bs) == ["0"]
