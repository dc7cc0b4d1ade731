#!/usr/bin/env python3
"""Per-stage profile of the batched-query job: event-log stage
durations + task counts at one parallelism level.

Usage: python scripts/diag_query_stages.py --cpus 32 --root <index>
       (build the index first with diag_query_scaling.py --child build)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--root", required=True)
    ap.add_argument("--queries", type=int, default=1024)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="lss_evlog_")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("lss-qstages")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.daemon.module", "lucene_solr_spark.warm_daemon")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.builder import IndexTables
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

    tables = IndexTables(args.root, spark)
    searcher = IndexSearcher(tables, cache=True)
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
    searcher.search_many({"w": qs["q0"]}, 10)  # warm
    spark.sparkContext.setJobGroup("measured", "measured batch")
    t0 = time.time()
    n = len(searcher.search_many_df(qs, 10).collect())
    wall = time.time() - t0
    print(f"wall={wall:.2f}s rows={n}")
    spark.stop()

    # parse the event log: stages in the measured window (last jobs)
    ev = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
    if os.path.isdir(ev):  # rolling event-log layout
        cands = [p for p in glob.glob(os.path.join(ev, "*"))
                 if os.path.isfile(p) and "appstatus" not in p]
        ev = sorted(cands)[-1]
    stages = {}
    tasks: dict[int, list] = {}
    with open(ev) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                sub = si["Submission Time"]
                comp = si["Completion Time"]
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "dur_s": round((comp - sub) / 1000.0, 2),
                }
            elif e.get("Event") == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                ti = e["Task Info"]
                tm = e.get("Task Metrics") or {}
                dur = (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
                recs = 0
                for k in ("Input Metrics",):
                    recs += (tm.get(k) or {}).get("Records Read", 0)
                recs += ((tm.get("Shuffle Read Metrics") or {})
                         .get("Total Records Read", 0))
                pyt = 0
                for acc in ti.get("Accumulables", []):
                    if acc.get("Name") == "internal.metrics.executorRunTime":
                        pass
                tasks.setdefault(sid, []).append((dur, recs))
    for sid in sorted(stages):
        s = stages[sid]
        ts = sorted(t[0] for t in tasks.get(sid, []))
        recs = sum(t[1] for t in tasks.get(sid, []))
        med = ts[len(ts) // 2] if ts else 0.0
        mx = ts[-1] if ts else 0.0
        print(f"stage {sid:3d} {s['dur_s']:8.2f}s tasks={s['tasks']:4d} "
              f"task_med={med:6.2f}s task_max={mx:6.2f}s recs={recs:>10} "
              f"{s['name']}")
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
