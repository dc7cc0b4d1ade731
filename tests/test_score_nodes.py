"""scoreNodes (ScoreNodesStream.java:227-246) vs a hand-computed
oracle with the reference's per-factor float32 casts."""

import math

import numpy as np
import pytest

from lucene_solr_spark.streaming.graph import gather_nodes, score_nodes

EDGES = [
    ("a", "x"), ("a", "y"), ("b", "x"), ("b", "x"),  # b->x twice
    ("c", "y"), ("c", "z"), ("d", "z"),
]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_score_nodes_matches_reference_formula(spark, edges):
    roots = spark.createDataFrame([("a",), ("b",)], "node string")
    nodes = gather_nodes(edges, roots, src="src", dst="dst", levels=1,
                         scatter_branches=False)
    got = {r["node"]: r for r in
           score_nodes(nodes, edges, dst="dst").collect()}
    n_docs = len({s for s, _ in EDGES})              # 4 distinct sources
    dfreq = {"x": 2, "y": 2, "z": 2}                  # distinct (src,dst)
    tf = {"x": 3, "y": 1}                             # edges from {a,b}
    assert set(got) == set(tf)
    for node, t in tf.items():
        f1 = np.float32(math.log(t) + 1.0)
        f2 = np.float32(math.log((n_docs + 1) / (dfreq[node] + 1)) + 1.0)
        want = np.float32(float(f1) * float(f2))
        r = got[node]
        assert r["docFreq"] == dfreq[node] and r["numDocs"] == n_docs
        assert np.float32(r["nodeScore"]) == want


def test_score_nodes_unknown_node_docfreq_zero(spark, edges):
    nodes = spark.createDataFrame([("w", 2)], "node string, n_in long")
    r = score_nodes(nodes, edges, dst="dst").collect()[0]
    assert r["docFreq"] == 0
    f1 = np.float32(math.log(2) + 1.0)
    f2 = np.float32(math.log(5 / 1) + 1.0)
    assert np.float32(r["nodeScore"]) == np.float32(float(f1) * float(f2))
