"""Lloyd k-means properties on a deterministic toy set + plan hygiene."""

import pytest
from pyspark.sql import SparkSession, functions as F

from lucene_solr_spark.relational.clustering import (
    assign_clusters,
    kmeans,
    recompute_centroids,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def vecs(spark):
    # two tight blobs around (0,0) and (10,10)
    rows = [
        (0, [0.0, 0.1]), (1, [0.2, 0.0]), (2, [0.1, 0.2]),
        (3, [10.0, 10.1]), (4, [9.8, 10.0]), (5, [10.2, 9.9]),
    ]
    return spark.createDataFrame(rows, "vid long, v array<float>")


def test_kmeans_separates_blobs(spark, vecs):
    out = {r.vid: r.cluster for r in
           kmeans(vecs, "v", "vid", k=2, iters=2).collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]


def test_assignment_tie_breaks_to_lower_cid(spark):
    df = spark.createDataFrame([(0, [5.0, 5.0])], "vid long, v array<float>")
    cents = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]  # exactly equidistant
    row = assign_clusters(df, "v", cents).collect()[0]
    assert row.cluster == 0


def test_iterations_do_not_increase_inertia(spark, vecs):
    init = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]  # bad init: both near blob 1
    a1 = assign_clusters(vecs, "v", init)
    inertia1 = a1.agg(F.sum("dist")).collect()[0][0]
    c1 = recompute_centroids(a1, "v")
    a2 = assign_clusters(vecs, "v", c1)
    inertia2 = a2.agg(F.sum("dist")).collect()[0][0]
    assert inertia2 <= inertia1 + 1e-9


def test_no_python_in_assignment_plan(spark, vecs):
    plan = assign_clusters(
        vecs, "v", [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # zip_with/aggregate stay JVM-side
