"""Global-ordinals join (join/GlobalOrdinalsQuery.java +
index/OrdinalMap.java): identity vs the direct string join, OrdinalMap
reuse across joins, broadcast + int-ordinal plan shape."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.relational.joins import OrdinalMap, ordinal_join


@pytest.fixture(scope="module")
def frames(spark):
    dim = spark.createDataFrame(
        [("repo/alpha", 1), ("repo/beta", 2), ("repo/gamma", 3)],
        "repo string, stars int")
    fact = spark.createDataFrame(
        [("repo/alpha", "a.py"), ("repo/alpha", "b.py"),
         ("repo/beta", "c.py"), ("repo/delta", "d.py")],
        "repo string, path string")
    return fact, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_identity(frames):
    fact, dim = frames
    got = ordinal_join(fact, dim, "repo")
    exp = fact.join(dim, "repo")
    assert _rows(got.select("repo", "path", "stars")) == _rows(
        exp.select("repo", "path", "stars"))
    assert got.count() == 3  # repo/delta has no ordinal -> dropped


def test_left_identity(frames):
    fact, dim = frames
    got = ordinal_join(fact, dim, "repo", how="left")
    exp = fact.join(dim, "repo", "left")
    assert _rows(got.select("repo", "path", "stars")) == _rows(
        exp.select("repo", "path", "stars"))
    assert got.count() == 4  # delta survives with null stars


def test_ordinal_map_reused_across_joins(frames):
    fact, dim = frames
    m = OrdinalMap(dim, "repo")
    try:
        a = ordinal_join(fact, dim, "repo", omap=m)
        b = ordinal_join(fact.limit(2), dim, "repo", omap=m)
        assert a.count() == 3 and b.count() == 2
        # the map is one persisted dictionary (cached-per-reader role)
        assert m.dict.is_cached
        ords = {r["_gord"] for r in m.dict.collect()}
        assert ords == {0, 1, 2}  # dense
    finally:
        m.unpersist()


def test_plan_joins_on_int_ordinal_with_broadcast(frames):
    fact, dim = frames
    plan = (ordinal_join(fact, dim, "repo")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan  # the OrdinalMap is broadcast
    assert "_gord" in plan  # the actual join key is the dense int
