"""RangeField relation queries (relational/ranges.py) vs hand-worked
cases from the RangeFieldQuery.java relation matrix, including the
CROSSES = INTERSECTS AND NOT WITHIN identity and multi-dim AND."""

import pytest

from lucene_solr_spark.relational.ranges import (
    RELATIONS,
    range_field_query,
    range_relation_counts,
)

# doc ranges (1-dim): (name, dmin, dmax) vs query [10, 20]
CASES_1D = [
    # disjoint left / right
    ("left", 0, 5, set()),
    ("right", 25, 30, set()),
    # touching boundary counts as intersecting (inclusive ends)
    ("touch_lo", 0, 10, {"intersects", "crosses"}),
    ("touch_hi", 20, 30, {"intersects", "crosses"}),
    # strictly inside the query
    ("inside", 12, 18, {"intersects", "within"}),
    # equals the query: within AND contains, not crosses
    ("equal", 10, 20, {"intersects", "within", "contains"}),
    # strictly contains the query
    ("outer", 5, 25, {"intersects", "contains", "crosses"}),
    # partial overlap
    ("overlap", 15, 25, {"intersects", "crosses"}),
]


@pytest.fixture(scope="module")
def df_1d(spark):
    return spark.createDataFrame(
        [(n, mn, mx) for n, mn, mx, _ in CASES_1D],
        "name string, mn int, mx int")


@pytest.mark.parametrize("relation", RELATIONS)
def test_relation_matrix_1d(spark, df_1d, relation):
    got = {
        r["name"]
        for r in range_field_query(
            df_1d, [("mn", "mx")], [(10, 20)], relation).collect()
    }
    want = {n for n, _, _, rels in CASES_1D if relation in rels}
    assert got == want, f"{relation}: {got} != {want}"


def test_crosses_is_intersects_minus_within(spark, df_1d):
    inter = {r["name"] for r in range_field_query(
        df_1d, [("mn", "mx")], [(10, 20)], "intersects").collect()}
    within = {r["name"] for r in range_field_query(
        df_1d, [("mn", "mx")], [(10, 20)], "within").collect()}
    crosses = {r["name"] for r in range_field_query(
        df_1d, [("mn", "mx")], [(10, 20)], "crosses").collect()}
    assert crosses == inter - within


def test_multi_dim_is_and_across_dims(spark):
    # dim A intersects for both rows; dim B only for row "yes"
    df = spark.createDataFrame(
        [("yes", 12, 18, 105, 110), ("no", 12, 18, 200, 210)],
        "name string, amin int, amax int, bmin int, bmax int")
    got = {r["name"] for r in range_field_query(
        df, [("amin", "amax"), ("bmin", "bmax")],
        [(10, 20), (100, 120)], "intersects").collect()}
    assert got == {"yes"}


def test_counts_entry_shape(spark, df_1d):
    out = range_relation_counts(
        df_1d.withColumn("key", df_1d.mn + df_1d.mx),
        [("mn", "mx")], [(10, 20)], "key").collect()
    by_rel = {r["relation"]: (r["n"], r["key_sum"]) for r in out}
    assert set(by_rel) == set(RELATIONS)
    # intersects count from the matrix above
    want_n = sum(1 for _, _, _, rels in CASES_1D if "intersects" in rels)
    assert by_rel["intersects"][0] == want_n
    # checksum really keys on membership
    want_sum = sum(mn + mx for _, mn, mx, rels in CASES_1D
                   if "within" in rels)
    assert by_rel["within"][1] == want_sum


def test_dim_mismatch_raises(spark, df_1d):
    with pytest.raises(ValueError, match="dims"):
        range_field_query(df_1d, [("mn", "mx")], [(1, 2), (3, 4)],
                          "intersects")
    with pytest.raises(ValueError, match="relation"):
        range_field_query(df_1d, [("mn", "mx")], [(1, 2)], "overlaps")
