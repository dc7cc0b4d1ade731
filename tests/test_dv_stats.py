"""DocValuesStats collector (relational/dv_stats.py) vs hand-computed
Welford results from the DocValuesStats.java semantics: population
variance, missing counting, sorted-field extrema, and the
sorted-numeric per-VALUE stats with valuesCount != doc count."""

import math

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.relational.dv_stats import docvalues_stats


def _welford(values):
    """LongDocValuesStats.doAccumulate (:155-167), literally."""
    mean = variance = 0.0
    mn, mx = float("inf"), float("-inf")
    for i, v in enumerate(values, start=1):
        mn, mx = min(mn, v), max(mx, v)
        old = mean
        mean += (v - mean) / i
        variance += (v - mean) * (v - old)
    n = len(values)
    return dict(count=n, min=mn, max=mx, sum=sum(values), mean=mean,
                variance=variance / n if n else 0.0)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # (id, num, tag, arr)
        (1, 10.0, "b", [1.0, 3.0]),
        (2, 4.0, "a", [2.0]),
        (3, None, "c", None),
        (4, 7.5, None, []),
        (5, 2.5, "a", [5.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "id int, num double, tag string, arr array<double>")


def _collect(out):
    return {r["field"]: r.asDict() for r in out.collect()}


def test_numeric_stats_match_welford(spark, df):
    vals = [10.0, 4.0, 7.5, 2.5]
    want = _welford(vals)
    got = _collect(docvalues_stats(df, numeric_fields=("num",)))["num"]
    assert got["cnt"] == want["count"]
    assert got["missing"] == 1.0  # doc 3
    assert got["vmin"] == want["min"] and got["vmax"] == want["max"]
    assert got["vsum"] == pytest.approx(want["sum"])
    assert got["mean"] == pytest.approx(want["mean"])
    assert got["variance"] == pytest.approx(want["variance"])
    assert got["stdev"] == pytest.approx(math.sqrt(want["variance"]))


def test_query_predicate_scopes_the_collector(spark, df):
    got = _collect(docvalues_stats(
        df, numeric_fields=("num",), predicate=F.col("id") <= 2))["num"]
    want = _welford([10.0, 4.0])
    assert got["cnt"] == 2.0 and got["missing"] == 0.0
    assert got["variance"] == pytest.approx(want["variance"])


def test_sorted_field_extrema(spark, df):
    got = _collect(docvalues_stats(df, sorted_fields=("tag",)))["tag"]
    assert (got["str_min"], got["str_max"]) == ("a", "c")
    assert got["cnt"] == 4.0 and got["missing"] == 1.0
    assert got["vmin"] is None and got["mean"] is None


def test_sorted_numeric_per_value_stats(spark, df):
    # values across docs: [1,3], [2], [5,1,0] -> 6 values, 3 docs with
    # values (doc 3 NULL and doc 4 empty are both "missing":
    # SortedNumericDocValuesStats counts docs via advanceExact)
    got = _collect(docvalues_stats(
        df, sorted_numeric_fields=("arr",)))["arr"]
    vals = [1.0, 3.0, 2.0, 5.0, 1.0, 0.0]
    want = _welford(vals)
    assert got["cnt"] == 3.0
    assert got["missing"] == 2.0
    assert got["values_count"] == 6.0
    assert got["vmin"] == 0.0 and got["vmax"] == 5.0
    assert got["vsum"] == pytest.approx(sum(vals))
    assert got["mean"] == pytest.approx(want["mean"])
    assert got["variance"] == pytest.approx(want["variance"])


def test_mixed_kinds_one_pass(spark, df):
    out = docvalues_stats(df, numeric_fields=("num",),
                          sorted_fields=("tag",),
                          sorted_numeric_fields=("arr",))
    got = _collect(out)
    assert set(got) == {"num", "tag", "arr"}
    # single wide agg feeding every piece: no per-field re-scan of the
    # source in the plan (one Aggregate over the input per branch is
    # union'd, but each reads the SAME one-row aggregated result)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") == 0  # real plan, sanity
