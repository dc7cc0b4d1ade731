#!/usr/bin/env python3
"""Time isolated pieces of the batched-query plan at one parallelism
level to find the non-scaling component.

Usage: python scripts/diag_query_variants.py --cpus 32 --root /tmp/lss_qidx
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--root", required=True)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--nocache", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lss-qvar")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.daemon.module", "lucene_solr_spark.warm_daemon")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.builder import IndexTables
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

    tables = IndexTables(args.root, spark)
    searcher = IndexSearcher(tables, cache=not args.nocache)
    hi = [r["term"] for r in
          searcher.dict.orderBy(F.desc("df"), "term").limit(512).collect()]
    mid = [r["term"] for r in
           (searcher.dict.where(F.col("df").between(3, 50))
            .orderBy("term").limit(512).collect())] or hi
    qs = {}
    for i in range(args.queries):
        a, b = mid[(37 * i) % len(mid)], hi[(53 * i) % len(hi)]
        qs[f"q{i}"] = (TermQuery(b) if i % 3 == 0
                       else BooleanQuery.of(should=[TermQuery(a), TermQuery(b)]))

    def t(label, thunk, n=1):
        # first run may build the cache; report each run
        for r in range(n):
            t0 = time.time()
            v = thunk()
            print(f"{label} run{r}: {time.time()-t0:6.2f}s  -> {v}")

    terms = sorted({c.query.term for q in qs.values()
                    for c in (q.clauses if isinstance(q, BooleanQuery)
                              else [type('C', (), {'query': q})()])}
                   if False else
                   {t2 for q in qs.values()
                    for t2 in ([q.term] if isinstance(q, TermQuery)
                               else [c.query.term for c in q.clauses])})
    print(f"distinct terms: {len(terms)}")

    post = searcher.postings
    # 0) materialize cache (if caching)
    t("warm_full_scan_count", lambda: post.count(), n=2)
    # 1) filtered scan only
    filt = post.where(F.col("term").isin(list(terms)))
    t("filtered_count", lambda: filt.count(), n=2)
    # 2) filtered + groupBy(term) agg (shuffle of ~1000 rows)
    t("filtered_agg_term", lambda: filt.groupBy("term").count().count(), n=2)
    # 3) full search_many_df
    t("search_many_1024", lambda: len(searcher.search_many_df(qs, 10).collect()), n=2)

    # 4) join+score project, no shuffle: sum scores (partial agg only)
    import numpy as np

    qid_list = list(qs)
    qidx_of = {q: i for i, q in enumerate(qid_list)}
    clause_rows = []
    for qid, q in qs.items():
        cls = ([ (q, "SHOULD") ] if isinstance(q, TermQuery)
               else [(c.query, c.occur) for c in q.clauses])
        for cq, occ in cls:
            df = searcher.term_stats({(cq.field, cq.term)}).get((cq.field, cq.term), 0)
            w = float(searcher.field_scorer(cq.field).weight(df, 1.0)) if df else 0.0
            clause_rows.append((qidx_of[qid], cq.field, cq.term, w))
    clause_df = spark.createDataFrame(
        clause_rows, "qidx int, field string, term string, weight float")
    norm_rows = [("content", i, float(searcher.scorers["content"].cache[i]))
                 for i in range(256)]
    norm_df = spark.createDataFrame(norm_rows, "field string, _nb int, cache float")
    joined = (filt.join(F.broadcast(clause_df), ["field", "term"])
              .withColumn("_nb", F.col("norm").cast("int").bitwiseAND(F.lit(255)))
              .join(F.broadcast(norm_df), ["field", "_nb"]))
    tfd = F.col("tf").cast("double")
    scored = joined.select(
        "qidx", "docid",
        (F.col("weight") * (tfd / (tfd + F.col("cache").cast("double"))).cast("float"))
        .cast("float").alias("s"))
    t("join_score_sum", lambda: scored.agg(F.sum("s")).collect()[0][0], n=2)
    # 5) + groupBy(qidx,docid) agg (the shuffle) — count only
    agg = scored.groupBy("qidx", "docid").agg(F.sum(F.col("s").cast("double")).alias("_s"))
    t("agg_count", lambda: agg.count(), n=2)
    # 6) + window topk
    from pyspark.sql import Window

    w = Window.partitionBy("qidx").orderBy(F.desc("_s"), F.asc("docid"))
    topk = agg.select("qidx", "docid", F.row_number().over(w).alias("rn")).where(F.col("rn") <= 10)
    t("window_topk_count", lambda: topk.count(), n=2)
    # 7) full with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("search_many_noaqe", lambda: len(searcher.search_many_df(qs, 10).collect()), n=2)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
