"""gatherNodes / shortestPath semantics on a hand-built graph.

    a -> b -> d -> f
    a -> c -> d
         c -> e -> f
    f -> a   (cycle back)

Shortest a->f paths: a-b-d-f and a-c-e-f (len 3); a-c-d-f ties.
"""

import pytest
from pyspark.sql import SparkSession

from lucene_solr_spark.streaming.expressions import StreamFactory
from lucene_solr_spark.streaming.graph import gather_nodes, shortest_paths

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
    ("c", "e"), ("d", "f"), ("e", "f"), ("f", "a"),
]


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
def edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_shortest_paths_all_min_depth(spark, edges):
    got = sorted(
        "->".join(r.path)
        for r in shortest_paths(edges, "a", "f", max_depth=5).collect()
    )
    assert got == ["a->b->d->f", "a->c->d->f", "a->c->e->f"]


def test_shortest_paths_direct_edge_wins(spark, edges):
    # b->d->f is depth 2; no shorter route
    got = ["->".join(r.path)
           for r in shortest_paths(edges, "b", "f", max_depth=5).collect()]
    assert got == ["b->d->f"]


def test_shortest_paths_unreachable_and_depth_cap(spark, edges):
    assert shortest_paths(edges, "f", "zzz", max_depth=3).count() == 0
    # a->f needs 3 hops; maxDepth=2 must come back empty
    assert shortest_paths(edges, "a", "f", max_depth=2).count() == 0


def test_shortest_paths_cycle_safe(spark, edges):
    # f->a edge creates a cycle; BFS must still terminate and find
    # f->a (depth 1)
    got = ["->".join(r.path)
           for r in shortest_paths(edges, "f", "a", max_depth=6).collect()]
    assert got == ["f->a"]


def test_gather_nodes_levels_and_counts(spark, edges):
    roots = spark.createDataFrame([("a",)], "node string")
    rows = {
        (r.level, r.node): r.n_in
        for r in gather_nodes(edges, roots, src="src", dst="dst",
                              levels=2).collect()
    }
    # level 0 = roots (scatter branches); level 1 = {b, c}; level 2 =
    # {d (2 in-edges: from b and c), e (1 from c)}
    assert rows == {(0, "a"): 0, (1, "b"): 1, (1, "c"): 1,
                    (2, "d"): 2, (2, "e"): 1}


def test_gather_nodes_track_traversal(spark, edges):
    roots = spark.createDataFrame([("f",)], "node string")
    with_track = {
        (r.level, r.node)
        for r in gather_nodes(edges, roots, src="src", dst="dst",
                              levels=3, track_traversal=True).collect()
    }
    # f -> a -> {b,c} -> {d,e}: nothing revisits f or a
    assert with_track == {(0, "f"), (1, "a"), (2, "b"), (2, "c"),
                          (3, "d"), (3, "e")}
    without = {
        (r.level, r.node)
        for r in gather_nodes(edges, roots, src="src", dst="dst",
                              levels=3, track_traversal=False).collect()
    }
    assert (3, "d") in without and (3, "e") in without


def test_stream_language_graph_functions(spark, edges):
    roots = spark.createDataFrame([("a",)], "node string")
    sf = StreamFactory({"g": edges, "r": roots})
    gathered = sf.compile(
        'nodes(g, search(r), walk="node->src", gather="dst", '
        'maxLevels=1, scatter="leaves")')
    assert {r.node for r in gathered.collect()} == {"b", "c"}
    paths = sf.compile(
        'shortestPath(g, from="a", to="f", edge="src=dst", maxDepth=5)')
    assert paths.count() == 3
