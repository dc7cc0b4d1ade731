"""Plan assertions for round-4 operators: the physical strategy IS the
design claim (broadcast candidate join for the prefix-tree grid; no
Python eval in the matrix gram pipeline)."""

import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_geo_prefix_tree_broadcasts_cells(spark):
    from lucene_solr_spark.relational.suite import QUERIES

    df = QUERIES["geo_prefix_tree"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, "grid join must broadcast, not SMJ"


def test_stream_matrix_ops_no_python_eval(spark):
    from lucene_solr_spark.relational.suite import QUERIES

    df = QUERIES["stream_matrix_ops"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                   "MapInPandas"):
        assert marker not in plan, marker


def test_geo_polygon_holes_no_python_eval(spark):
    from lucene_solr_spark.relational.suite import QUERIES

    df = QUERIES["geo_polygon_holes"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
