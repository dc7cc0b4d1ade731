"""IVF (inverted-file) approximate nearest neighbors over an
embedding column — the cluster-pruned scale path for similarity
search, complementing the multi-probe SRP-LSH ANN in
`relational/suite.py::ann_cosine_knn`.

Structure (FAISS IVF-Flat shape; public algorithm — Jégou et al.,
"Product quantization for nearest neighbor search", §IVFADC coarse
stage):

* **train/build**: Lloyd k-means (reusing `relational/clustering.py`)
  over a sample gives ``nlist`` coarse centroids; every vector is
  assigned to its nearest centroid → an assignment table
  ``(id, cluster)``. At 100 TB the assignment table is written
  partitioned by ``cluster`` so each posting list is its own
  partition directory — a probe reads only ``nprobe`` partitions
  (partition pruning does the "inverted file" part; no shuffle at
  query time).
* **search**: rank centroids by distance to the query (driver-side
  math over ``nlist`` floats — tiny), take the ``nprobe`` nearest,
  scan ONLY those clusters' members and exact-cosine rerank.

The probed fraction is ~``nprobe/nlist`` of the corpus — the same
recall/cost dial as FAISS. Everything is JVM expression math
(`aggregate` over zipped arrays); no Python in the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["IvfIndex", "build_ivf", "ivf_search"]

_DOT = ("aggregate(zip_with({0}, {1}, (a, b) -> a * b), "
        "cast(0.0 as double), (acc, x) -> acc + x)")


class IvfIndex:
    """Coarse centroids + cluster-assigned vectors.

    ``centroids`` is a list of ``(cluster_id, vector)`` pairs (ids can
    be sparse — Lloyd rounds drop emptied clusters). ``assigned``
    carries (id, e double[], nrm, cluster); when ``root`` is set it is
    parquet partitioned by ``cluster`` and probes prune to the probed
    partition dirs.
    """

    def __init__(self, centroids: list[tuple[int, list[float]]],
                 assigned: DataFrame,
                 id_col: str, root: str | None = None):
        self.centroids = centroids
        self.assigned = assigned
        self.id_col = id_col
        self.root = root


def _norm_cols(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("e"),
    ).withColumn("nrm", F.sqrt(F.expr(_DOT.format("e", "e"))))


def build_ivf(df: DataFrame, vec_col: str, id_col: str,
              nlist: int = 16, iters: int = 5,
              root: str | None = None) -> IvfIndex:
    """Train coarse centroids (k-means over the full frame here; a
    sample at scale) and assign every vector to its nearest list.
    With ``root``, the assignment table is persisted partitioned by
    cluster — the on-disk inverted file."""
    from ..relational.clustering import assign_clusters, recompute_centroids

    n = _norm_cols(df, vec_col, id_col)
    init = (n.orderBy(id_col).limit(nlist)
            .select(id_col, "e").collect())
    centroids = [(i, list(r.e)) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = assign_clusters(n, "e", centroids)
        centroids = recompute_centroids(assigned, "e")
    assigned = assign_clusters(n, "e", centroids).select(
        id_col, "e", "nrm", "cluster")
    if root is not None:
        (assigned.write.mode("overwrite")
         .partitionBy("cluster").parquet(root))
        spark = df.sparkSession
        assigned = spark.read.parquet(root)
    return IvfIndex(list(centroids), assigned, id_col, root)


def ivf_search(index: IvfIndex, query_vec: list[float], k: int = 10,
               nprobe: int = 4) -> DataFrame:
    """Top-k by cosine among the ``nprobe`` nearest clusters only.

    Centroid ranking is driver-side (nlist floats); the member scan is
    a partition-pruned filter + JVM cosine + top-k — per query it
    touches ~nprobe/nlist of the corpus and shuffles nothing but the
    k result rows."""
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5

    def dist2(c):
        return sum((a - b) * (a - b) for a, b in zip(c, q))

    ranked = sorted(index.centroids, key=lambda ic: (dist2(ic[1]), ic[0]))
    probes = [cid for cid, _c in ranked[:nprobe]]
    qcol = F.array(*[F.lit(x) for x in q])
    cos = (F.expr(_DOT.format("e", "q_e"))
           / (F.col("nrm") * F.lit(qn)))
    return (index.assigned
            .where(F.col("cluster").isin(probes))
            .withColumn("q_e", qcol)
            .select(F.col(index.id_col),
                    F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(index.id_col))
            .limit(k))


def brute_force_topk(df: DataFrame, vec_col: str, id_col: str,
                     query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k (the baseline the IVF recall gate is
    measured against)."""
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    n = _norm_cols(df, vec_col, id_col)
    cos = (F.expr(_DOT.format("e", "q_e")) / (F.col("nrm") * F.lit(qn)))
    return (n.withColumn("q_e", F.array(*[F.lit(x) for x in q]))
            .select(F.col(id_col), F.round(cos, 6).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col))
            .limit(k))
