"""IR quality evaluation — the lucene/benchmark quality package.

References:
- ``lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
  QualityStats.java`` — per-query stats with the reference's exact
  conventions: AP = Σ_{relevant hits} (goodSoFar/rank) divided by the
  TOTAL number of relevant docs (:119-124 getAvp over maxGoodPoints);
  MRR counts the first relevant hit ONLY when it ranks within the
  top 5 (:88-90); P@n for n ≤ 20 with the tail extrapolation
  (numPoints·p[numPoints])/n when fewer results were returned
  (:104-117); recall = found/existing.
- ``quality/trec/TrecJudge.java`` — qrels-style binary judgments.
- ``quality/QualityBenchmark.java`` — run the judged query set and
  average the stats.

Two renderings:
- :class:`TrecJudge` + :func:`judge_run` — driver-side, list-shaped
  (the QualityBenchmark loop).
- :func:`evaluate_run_df` — the same math as DataFrame window/agg
  expressions over a (qid, rank, doc_id) run joined to (qid, doc_id)
  judgments: one window per query for the running good-count, one
  aggregation for AP/P@N/RR/recall. No UDFs; scales with the run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MAX_POINTS = 20  # QualityStats.java:30


class TrecJudge:
    """qrels: {qid: set(relevant doc ids)} (TrecJudge.java role)."""

    def __init__(self, qrels: dict):
        self.qrels = {q: set(rel) for q, rel in qrels.items()}

    def is_relevant(self, qid, docid) -> bool:
        return docid in self.qrels.get(qid, ())

    def max_good(self, qid) -> int:
        return len(self.qrels.get(qid, ()))


def judge_run(run: dict, judge: TrecJudge,
              points=(1, 5, 10, 20)) -> dict:
    """{qid: ranked [docid, ...]} → per-query + mean stats with the
    QualityStats conventions. Returns {"per_query": {qid: {...}},
    "mean": {...}} — means follow QualityStats.average (plain
    arithmetic means over queries)."""
    per_query = {}
    for qid, docs in run.items():
        max_good = judge.max_good(qid)
        good = 0
        p_sum = 0.0
        rr = 0.0
        p_at = {}
        for i, d in enumerate(docs, start=1):
            rel = judge.is_relevant(qid, d)
            if rel:
                good += 1
                if good == 1 and i <= 5:  # QualityStats.java:88-90
                    rr = 1.0 / i
                p_sum += good / i
            if i <= MAX_POINTS:
                p_at[i] = good / i
        n = len(docs)
        stats = {
            "ap": 0.0 if max_good == 0 else p_sum / max_good,
            "recall": (good / max_good) if max_good > 0
            else (good / n if n else 0.0),
            "rr": rr,
            "num_results": n,
            "num_relevant_found": good,
        }
        for p in points:
            if p > n:  # tail extrapolation (QualityStats.java:110-112)
                stats[f"p{p}"] = (n * (p_at.get(n, 0.0))) / p if n else 0.0
            else:
                stats[f"p{p}"] = p_at[p]
        per_query[qid] = stats
    keys = next(iter(per_query.values())).keys() if per_query else []
    mean = {k: sum(s[k] for s in per_query.values()) / len(per_query)
            for k in keys if k != "num_results"} if per_query else {}
    return {"per_query": per_query, "mean": mean}


def evaluate_run_df(run: DataFrame, judgments: DataFrame,
                    points=(5, 10)) -> DataFrame:
    """DataFrame rendering: ``run`` (qid, doc_id, rank — rank 1-based
    within qid), ``judgments`` (qid, doc_id) relevant pairs. Returns
    one row per qid: ap, rr, recall, p{n}..., num_relevant. Pure
    window/agg math over the joined run (the scan is the run itself —
    judgments broadcast)."""
    j = judgments.select("qid", "doc_id").distinct() \
        .withColumn("_rel", F.lit(1))
    max_good = j.groupBy("qid").agg(
        F.count("*").alias("_max_good"))
    joined = (run.join(F.broadcast(j), ["qid", "doc_id"], "left")
              .withColumn("_rel", F.coalesce(F.col("_rel"), F.lit(0))))
    w = Window.partitionBy("qid").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wq = Window.partitionBy("qid")
    scored = (joined.withColumn("_good", F.sum("_rel").over(w))
              .withColumn("_is_last",
                          F.col("rank") == F.max("rank").over(wq)))
    aggs = [
        F.sum(F.when(F.col("_rel") == 1,
                     F.col("_good") / F.col("rank"))).alias("_p_sum"),
        F.max(F.when((F.col("_rel") == 1) & (F.col("_good") == 1)
                     & (F.col("rank") <= 5),
                     1.0 / F.col("rank"))).alias("_rr"),
        F.max("_good").alias("_found"),
        F.count("*").alias("num_results"),
        F.max(F.when(F.col("_is_last"),
                     F.col("_good") / F.col("rank"))).alias("_ptail"),
    ]
    for p in points:
        aggs.append(F.max(
            F.when(F.col("rank") == p, F.col("_good") / p)).alias(f"_p{p}"))
    per_q = scored.groupBy("qid").agg(*aggs)
    out_cols = [
        "qid",
        F.coalesce(F.col("_p_sum") / F.col("_max_good"),
                   F.lit(0.0)).alias("ap"),
        F.coalesce(F.col("_rr"), F.lit(0.0)).alias("rr"),
        F.coalesce(F.col("_found") / F.col("_max_good"),
                   F.lit(0.0)).alias("recall"),
        F.col("_found").alias("num_relevant_found"),
        F.coalesce(F.col("_max_good"), F.lit(0))
        .alias("num_relevant"),
    ]
    for p in points:
        # tail extrapolation when the run returned fewer than p rows
        out_cols.append(F.when(
            F.col("num_results") >= p, F.col(f"_p{p}")).otherwise(
            F.col("num_results") * F.col("_ptail") / p)
            .alias(f"p{p}"))
    # LEFT join: a query with zero judged-relevant docs still emits a
    # row (ap/rr/recall 0) — judge_run's behavior; an inner join would
    # silently drop it and inflate the caller's MAP
    return (per_q.join(F.broadcast(max_good), "qid", "left")
            .select(*out_cols))
