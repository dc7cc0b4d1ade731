"""Document clustering: distributed Lloyd k-means over embeddings.

Reference role: Solr's ClusteringComponent
(solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/
ClusteringComponent.java) clusters search results via the carrot2
engine; the engine is pluggable, and k-means is carrot2's
BisectingKMeansClusteringAlgorithm building block. Here the clustering
runs over the `embeddings` table (the modern vector substrate) with
the classic Lloyd iteration.

Spark shape (the Spark-MLlib KMeans pattern): centroids are a tiny
k×dim table BROADCAST as literal arrays; each iteration is ONE scan of
the vector table — per-row distances via zip_with/aggregate (pure JVM
higher-order array functions, no Python in the plan), argmin via
array_min over (dist, cid) structs, then a (cluster, dim)-keyed avg
whose k×dim result is collected to the driver for the next round's
literals. The driver sync point is k×dim scalars per iteration —
constant in corpus size — which is exactly how MLlib's KMeans
aggregates centroids.

Determinism (so a DuckDB oracle can replicate bit-for-bit at the
driver's rounding): init centroids = the k lowest-id vectors; float32
embeddings widen exactly to double in both engines; per-row distance
sums run in array order in both; recomputed centroids are rounded to 6
decimals each round so cross-engine avg() summation-order ulps cannot
flip a later assignment; argmin ties break on centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .suite import load_table, register

K = 4
ITERS = 2


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _sqdist(vec_col, centroid: list[float]):
    """Squared euclidean distance to a literal centroid — JVM-side
    zip_with + aggregate, summed in array (dimension) order."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    diffs = F.zip_with(vec_col, lit, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def assign_clusters(df: DataFrame, vec_col: str,
                    centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """Add (cluster, dist): argmin over centroids, ties to lower cid.

    array_min over struct(dist, cid) compares lexicographically —
    distance first, centroid id as the tie-break.
    """
    v = _as_double(F.col(vec_col))
    pairs = F.array(*[
        F.struct(_sqdist(v, c).alias("d"), F.lit(int(cid)).alias("cid"))
        for cid, c in centroids
    ])
    best = F.array_min(pairs)
    return df.withColumn("cluster", best["cid"]).withColumn("dist", best["d"])


def recompute_centroids(assigned: DataFrame, vec_col: str,
                        round_digits: int = 6) -> list[tuple[int, list[float]]]:
    """Per-cluster dimension means, rounded, collected (k×dim scalars)."""
    rows = (
        assigned.select("cluster", F.posexplode(_as_double(F.col(vec_col)))
                        .alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg("v"), round_digits).alias("m"))
        .groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
        .collect()
    )
    return sorted((r.cluster, [x.m for x in r.ms]) for r in rows)


def kmeans(df: DataFrame, vec_col: str, id_col: str,
           k: int = K, iters: int = ITERS) -> DataFrame:
    """Lloyd k-means: init = the k lowest-id vectors, `iters` rounds of
    (assign, recompute), then the final assignment with its distance."""
    init = (df.orderBy(id_col).limit(k)
            .select(id_col, _as_double(F.col(vec_col)).alias("c")).collect())
    centroids = [(i, list(r.c)) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, centroids)
        centroids = recompute_centroids(assigned, vec_col)
    return (assign_clusters(df, vec_col, centroids)
            .select(id_col, "cluster", F.round("dist", 4).alias("dist")))


def _oracle_sql(k: int = K, iters: int = ITERS) -> str:
    """The same iteration unrolled as DuckDB CTEs."""
    sq = "list_sum(list_transform(list_zip(emb.e, {c}.c), x -> (x[1]-x[2])*(x[1]-x[2])))"
    parts = [f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e AS c
           FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {k}))"""]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(f""",
    d{i} AS (SELECT emb.vec_id, {prev}.cid, {sq.format(c=prev)} AS d
             FROM emb CROSS JOIN {prev}),
    a{i} AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
               FROM d{i}) WHERE rn = 1),
    u{i} AS (SELECT a{i}.cid, unnest(emb.e) AS v, generate_subscripts(emb.e, 1) AS pos
             FROM emb JOIN a{i} USING (vec_id)),
    c{i} AS (SELECT cid, list(m ORDER BY pos) AS c FROM (
               SELECT cid, pos, round(avg(v), 6) AS m FROM u{i}
               GROUP BY cid, pos) GROUP BY cid)""")
        prev = f"c{i}"
    parts.append(f""",
    df AS (SELECT emb.vec_id, {prev}.cid, {sq.format(c=prev)} AS d
           FROM emb CROSS JOIN {prev})
    SELECT vec_id, cid AS cluster, round(d, 4) AS dist FROM (
      SELECT vec_id, cid, d,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM df) WHERE rn = 1""")
    return "".join(parts)


@register("cluster_kmeans", _oracle_sql())
def cluster_kmeans(spark, sf_dir):
    """k-means (k=4, 2 Lloyd rounds) over the embeddings table:
    (vec_id, cluster, dist). ClusteringComponent role on the vector
    substrate; the oracle unrolls the identical iteration in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans(emb, "embedding", "vec_id")
