#!/usr/bin/env python3
"""Diagnose batched-query scaling: where does the time go at 8 vs 32
cores, and how many partitions does each stage actually use?

Builds ONE v1 index (reused across levels — identical input), then per
level (fresh JVM) times: searcher init, plan warmup, and batches of
{64, 256, 1024} queries via search_many_df.

Usage: python scripts/diag_query_scaling.py [--docs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"lss-qdiag-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.daemon.module", "lucene_solr_spark.warm_daemon")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build(root: str, docs: int) -> None:
    spark = make_spark(32)
    spark.sparkContext.setLogLevel("ERROR")
    from lucene_solr_spark.corpus import corpus_df
    from lucene_solr_spark.index import build_index

    corpus = corpus_df(spark, docs, partitions=64)
    build_index(corpus, root)
    spark.stop()


def query_level(cpus: int, root: str, queries: int) -> None:
    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from lucene_solr_spark.index import IndexTables
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

    out = {"cpus": cpus}
    t0 = time.time()
    tables = IndexTables(root, spark)
    searcher = IndexSearcher(tables, cache=True)
    out["init_sec"] = round(time.time() - t0, 2)
    out["postings_parts"] = searcher.postings.rdd.getNumPartitions()

    hi_rows = searcher.dict.orderBy(F.desc("df"), "term").limit(512).collect()
    mid_rows = (searcher.dict.where(F.col("df").between(3, 50))
                .orderBy("term").limit(512).collect())
    hi = [r["term"] for r in hi_rows]
    mid = [r["term"] for r in mid_rows] or hi

    def mk(n):
        qs = {}
        for i in range(n):
            a, b = mid[(37 * i) % len(mid)], hi[(53 * i) % len(hi)]
            qs[f"q{i}"] = (TermQuery(b) if i % 3 == 0
                           else BooleanQuery.of(should=[TermQuery(a), TermQuery(b)]))
        return qs

    t0 = time.time()
    searcher.search_many(mk(1), 10)  # warm
    out["warm_sec"] = round(time.time() - t0, 2)

    for n in (64, 256, 1024):
        qs = mk(n)
        t0 = time.time()
        df = searcher.search_many_df(qs, 10)
        plan_sec = time.time() - t0
        t0 = time.time()
        rows = df.collect()
        exec_sec = time.time() - t0
        out[f"q{n}_plan_sec"] = round(plan_sec, 2)
        out[f"q{n}_exec_sec"] = round(exec_sec, 2)
        out[f"q{n}_qps"] = round(n / (plan_sec + exec_sec), 1)
        out[f"q{n}_rows"] = len(rows)
    print("DIAG_RESULT " + json.dumps(out))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--child", choices=["build", "query"], default=None)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--root", default=None)
    ap.add_argument("--queries", type=int, default=1024)
    args = ap.parse_args()

    if args.child == "build":
        build(args.root, args.docs)
        return 0
    if args.child == "query":
        query_level(args.cpus, args.root, args.queries)
        return 0

    root = tempfile.mkdtemp(prefix="lss_qdiag_")
    print(f"building v1 index ({args.docs} docs) at {root} ...")
    t0 = time.time()
    subprocess.run([sys.executable, os.path.abspath(__file__), "--child", "build",
                    "--root", root, "--docs", str(args.docs)], check=True, cwd=REPO)
    print(f"build done in {time.time()-t0:.0f}s")
    for cpus in (8, 32):
        p = subprocess.run([sys.executable, os.path.abspath(__file__), "--child",
                            "query", "--cpus", str(cpus), "--root", root],
                           capture_output=True, text=True, cwd=REPO, timeout=1800)
        for ln in p.stdout.splitlines():
            if ln.startswith("DIAG_RESULT "):
                print(ln)
                break
        else:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-3000:])
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
