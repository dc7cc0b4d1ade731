"""IVF-Flat ANN (coarse k-means lists + nprobe-pruned exact rerank):
recall gate vs brute force, partition pruning of the on-disk inverted
file, and the probed-fraction cost model."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.ann import (
    brute_force_topk,
    build_ivf,
    ivf_search,
)

K = 10
NLIST = 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def ivf(emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivf") / "inverted_file")
    return build_ivf(emb, "embedding", "vec_id", nlist=NLIST, iters=4,
                     root=root)


def _query_vec(emb, vid=0):
    row = emb.where(F.col("vec_id") == vid).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_ivf_recall_gate(emb, ivf):
    """recall@10 >= 0.8 at nprobe=4/16 averaged over 5 query vectors
    (the FAISS-style recall/cost dial; self-match included — IVF must
    find the vector's own list)."""
    total = 0.0
    for vid in range(5):
        q = _query_vec(emb, vid)
        exact = [r["vec_id"] for r in
                 brute_force_topk(emb, "embedding", "vec_id", q, K).collect()]
        got = [r["vec_id"] for r in ivf_search(ivf, q, K, nprobe=4).collect()]
        total += len(set(exact) & set(got)) / K
    assert total / 5 >= 0.8


def test_ivf_full_probe_is_exact(emb, ivf):
    """nprobe = nlist degenerates to the exact scan — identical to
    brute force (sanity: pruning is the ONLY approximation)."""
    q = _query_vec(emb, 3)
    exact = [(r["vec_id"], r["cos_sim"]) for r in
             brute_force_topk(emb, "embedding", "vec_id", q, K).collect()]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           ivf_search(ivf, q, K, nprobe=NLIST).collect()]
    assert got == exact


def test_ivf_probe_prunes_partitions(emb, ivf):
    """The probe plan reads only the probed clusters: the cluster
    filter lands in the scan's partition filters (the inverted file is
    partitioned by cluster), and the probed member count is a strict
    subset of the corpus."""
    q = _query_vec(emb, 1)
    probed = ivf_search(ivf, q, K, nprobe=2)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    n_probed = (ivf.assigned
                .where(F.col("cluster").isin(
                    [cid for cid, _ in sorted(
                        ivf.centroids,
                        key=lambda ic: sum(
                            (a - b) * (a - b)
                            for a, b in zip(ic[1], q)))][:2]))
                .count())
    assert 0 < n_probed < emb.count()


def test_ivf_assignment_covers_corpus(emb, ivf):
    assert ivf.assigned.count() == emb.count()
    assert ivf.assigned.select("cluster").distinct().count() <= NLIST
    assert len(ivf.centroids) <= NLIST
