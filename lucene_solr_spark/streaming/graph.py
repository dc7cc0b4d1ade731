"""Graph traversal streams: gatherNodes / shortestPath.

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/
GatherNodesStream.java (breadth-first node gathering with optional
traversal tracking and per-node aggregations) and
ShortestPathStream.java (level-synchronous BFS that stops at the first
level reaching the target and emits every shortest path).

Spark shape: both are frontier-join iterations — each BFS level is ONE
distributed equi-join of the frontier against the edge table, exactly
the Pregel/level-synchronous pattern. The driver loop is over LEVELS
(bounded, tiny), never over rows; frontiers are persisted per level
and the visited set grows by union+distinct (same discipline as the
alternating-star connected components in relational/pipeline.py). At
100 TB the edge table is the big side: it stays partitioned by the
join key while the (much smaller) frontier broadcasts or shuffles to
it, and each level is a fresh AQE-planned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def gather_nodes(
    edges: DataFrame,
    roots: DataFrame,
    *,
    src: str,
    dst: str,
    levels: int = 1,
    track_traversal: bool = True,
    scatter_branches: bool = True,
) -> DataFrame:
    """Breadth-first gather: from the root node set, walk ``levels``
    hops along edges (src -> dst) and emit (level, node, n_in) where
    n_in counts the edges that reached the node at that level
    (GatherNodesStream.java:557-603 — the per-node count(*) metric).

    ``track_traversal=True`` excludes nodes already seen at an earlier
    level (GatherNodesStream.java:175 trackTraversal / "visited"
    semantics); ``scatter_branches`` also emits the root level itself
    (scatter="branches,leaves" vs just "leaves",
    GatherNodesStream.java:205-214).
    """
    if "node" not in roots.columns:
        raise ValueError("roots stream must expose a 'node' column")
    frontier = roots.select("node").distinct()
    visited = frontier
    out = None
    if scatter_branches:
        out = frontier.select(
            F.lit(0).alias("level"), "node", F.lit(0).cast("long").alias("n_in"))
    for lvl in range(1, levels + 1):
        hop = (
            edges.join(frontier.withColumnRenamed("node", src), src)
            .groupBy(F.col(dst).alias("node"))
            .agg(F.count("*").alias("n_in"))
        )
        if track_traversal:
            hop = hop.join(visited, "node", "left_anti")
        hop = hop.persist()
        level_rows = hop.select(F.lit(lvl).alias("level"), "node", "n_in")
        out = level_rows if out is None else out.unionByName(level_rows)
        frontier = hop.select("node")
        visited = visited.unionByName(frontier).distinct().persist()
    return out


def shortest_paths(
    edges: DataFrame,
    from_node: str,
    to_node: str,
    *,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 4,
) -> DataFrame:
    """All shortest paths from ``from_node`` to ``to_node`` as rows
    with a ``path`` array column (ShortestPathStream.java:40-48 — BFS
    by join level, stop at the first depth that reaches the target,
    emit every path found at that depth).

    Each level carries (node, path) where path is the array of nodes
    walked so far; cycle re-entry is pruned with the visited set of
    COMPLETED levels (a node first reached at depth d never appears on
    a shortest path through depth > d, so set-based pruning is exact
    for shortest paths and keeps the frontier from exploding).
    """
    spark = edges.sparkSession
    frontier = spark.createDataFrame(
        [(from_node, [from_node])], "node string, path array<string>")
    visited = frontier.select("node")
    for _depth in range(1, max_depth + 1):
        step = (
            edges.join(frontier.withColumnRenamed("node", src), src)
            .select(F.col(dst).alias("node"),
                    F.concat("path", F.array(F.col(dst))).alias("path"))
        )
        # prune nodes finished at earlier depths (exact for shortest
        # paths); keep the target itself matchable
        step = step.join(visited, "node", "left_anti").persist()
        hits = step.where(F.col("node") == to_node)
        if hits.limit(1).count() > 0:
            return hits.select("path")
        frontier = step
        visited = (visited.unionByName(step.select("node"))
                   .distinct().persist())
    return spark.createDataFrame([], "path array<string>")


def score_nodes(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    dst: str = "dst",
    term_freq_col: str = "n_in",
) -> DataFrame:
    """scoreNodes(): tf-idf ranking of gathered nodes
    (io/stream/ScoreNodesStream.java:227-246):

    ``nodeScore = (float)(ln(termFreq) + 1) ×
    (float)(ln((numDocs + 1) / (docFreq + 1)) + 1)``

    with termFreq = the tuple's gathered count (the stream's default
    ``count(*)`` field, :85), docFreq = the node term's document
    frequency in the collection and numDocs the collection size
    (:227,:237). Over an edge relation, a "document" is a distinct
    source node: docFreq(node) = distinct sources pointing at it.

    Each factor rounds to float32 before the multiply and the product
    rounds again — the reference's float casts at :243. One groupBy
    over the (deduplicated) edge list for the docFreq side plus one
    broadcast of the scalar numDocs; the nodes stream is small by
    construction (it came out of a gather), so the join broadcasts.
    """
    n_docs = edges.select("src").distinct().count()
    dfreq = (edges.select("src", dst).distinct()
             .groupBy(F.col(dst).alias("node"))
             .agg(F.count("*").alias("docFreq")))
    f1 = ((F.log(F.col(term_freq_col).cast("double")) + F.lit(1.0))
          .cast("float").cast("double"))
    f2 = ((F.log((F.lit(float(n_docs)) + 1.0)
                 / (F.col("docFreq").cast("double") + 1.0)) + F.lit(1.0))
          .cast("float").cast("double"))
    return (nodes.join(dfreq, "node", "left")
            .withColumn("docFreq",
                        F.coalesce(F.col("docFreq"), F.lit(0)))
            .withColumn("numDocs", F.lit(n_docs))
            .withColumn("nodeScore",
                        (f1 * f2).cast("float").cast("double")))
