#!/usr/bin/env python3
"""Per-stage wall-time diagnosis of the v2 segment-index build at one
parallelism level, with optional CPU-affinity pinning.

The round-2 verdict flagged NEGATIVE build scaling 8→32 threads on this
32-core box. Two confounders must be separated before touching code:

  * an UNPINNED local[8] is not an 8-CPU cluster — JVM GC/shuffle
    threads and the 8 Python workers spread over all 32 cores, so the
    "low" level borrows the idle 24 cores and inflates the baseline;
  * genuine 32-thread contention (memory bandwidth, GC at fixed heap,
    page-cache) would make 32 absolutely slower than 8.

This script runs ONE build in a fresh subprocess, optionally under
`taskset -c 0-(n-1)`, and reports the wall of each stage:
  analyze   assign_docids + JVM tokenize + persist + count
  docmap    slim lineage write
  blocks    groupBy(segment).applyInPandas → parquet  (the hot stage)
  derived   docs/dict/stats tables

Usage: python scripts/diag_build_stages.py --cpus 8 [--pin] [--docs 100000]
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


def child(cpus: int, docs: int, dps_override: int = 0) -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"lss-diag-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.daemon.module", "lucene_solr_spark.warm_daemon")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("LSS_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", os.environ.get("LSS_UI", "false"))
    )
    for kv in os.environ.get("LSS_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark = spark.config(k.strip(), v.strip())
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import shutil

    import numpy as np
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
    from lucene_solr_spark.analysis.jvm import analyzed_columns
    from lucene_solr_spark.corpus import corpus_df
    from lucene_solr_spark.index.builder import assign_docids
    from lucene_solr_spark.index.segments import (
        BLOCKS_SCHEMA,
        SegmentIndex,
        _segment_builder,
    )

    out = {"cpus": cpus, "docs": docs,
           "pinned": bool(os.environ.get("LSS_PINNED"))}
    corpus = corpus_df(spark, docs, partitions=cpus * 2)
    corpus.persist().count()

    dps = dps_override or max(docs // 64, 512)
    out["dps"] = dps
    out["thp_disabled"] = os.environ.get("LSS_THP_DISABLE") == "1"
    root = tempfile.mkdtemp(prefix=f"lss_diag_{cpus}_")
    idx = SegmentIndex(root, spark)

    # warmup quarter-size build (same as bench_scaling protocol)
    t = time.time()
    warm = corpus.where("pmod(crc32(path), 4) = 0")
    w_ids = assign_docids(warm).withColumn(
        "segment", (F.col("docid") / dps).cast("int"))
    w_an = analyzed_columns(w_ids).drop("content")
    w_an.persist(StorageLevel.MEMORY_AND_DISK).count()
    w_out = w_an.groupBy("segment").applyInPandas(
        _segment_builder(dps, ENGLISH_STOP_WORDS), BLOCKS_SCHEMA)
    warm_dir = os.path.join(root, "warm_blocks")
    w_out.write.mode("overwrite").partitionBy("segment").parquet(warm_dir)
    w_an.unpersist()
    shutil.rmtree(warm_dir, ignore_errors=True)
    out["warmup_sec"] = round(time.time() - t, 2)

    # ---- timed stages, mirroring build_segment_index ----
    # LSS_ANALYZE_MODE: "mem" (persist MEMORY_AND_DISK — the round-2
    # shape), "parquet" (spill the analyzed frame to disk and re-read:
    # no JVM cache pressure, page-cache backed), "none" (no
    # materialization; downstream stages recompute the tokenize)
    mode = os.environ.get("LSS_ANALYZE_MODE", "mem")
    out["analyze_mode"] = mode
    t = time.time()
    base = assign_docids(corpus)
    parent = getattr(base, "_lss_persisted_parent", None)
    with_ids = base.withColumn(
        "segment", (F.col("docid") / dps).cast("int"))
    if mode == "deferred":
        # the shipped build_segment_index shape: one-projection analyze
        # spilled to parquet, footer count, finalize after the barrier
        from lucene_solr_spark.analysis.jvm import (
            PY_CONTENT_COL,
            analyzed_deferred,
            finalize_analyzed,
        )

        ap = os.path.join(root, "analyzed_spill")
        analyzed_deferred(with_ids, max_token_length=255).write.mode(
            "overwrite").parquet(ap)
        spill = spark.read.parquet(ap)
        n = spill.count()
        analyzed = finalize_analyzed(spill, max_token_length=255)
        docmap_src = spill.drop("tokens", "content_sha256", PY_CONTENT_COL)
    else:
        analyzed = analyzed_columns(with_ids, max_token_length=255).drop("content")
        if mode == "mem":
            analyzed.persist(StorageLevel.MEMORY_AND_DISK)
            n = analyzed.count()
        elif mode == "parquet":
            ap = os.path.join(root, "analyzed_spill")
            analyzed.write.mode("overwrite").parquet(ap)
            analyzed = spark.read.parquet(ap)
            n = analyzed.count()
        else:
            n = analyzed.count()
        docmap_src = analyzed.drop("tokens", "content_sha256")
    if parent is not None:
        parent.unpersist()
    out["analyze_sec"] = round(time.time() - t, 2)

    t = time.time()
    docmap_src.write.mode("overwrite").parquet(idx.docmap_path)
    out["docmap_sec"] = round(time.time() - t, 2)

    t = time.time()
    builder = _segment_builder(dps, ENGLISH_STOP_WORDS)
    if mode == "deferred":
        # mirror the shipped chunk loop: one reduce unit per segment
        import math
        blk_src = analyzed.repartition(
            max(int(math.ceil(n / dps)), 1), "segment")
    else:
        blk_src = analyzed
    blk = blk_src.groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)
    blk.write.mode("overwrite").partitionBy("segment").parquet(idx.blocks_path)
    out["blocks_sec"] = round(time.time() - t, 2)

    t = time.time()
    from lucene_solr_spark.index.builder import PK

    idx.summaries().select(
        F.col("first_docid").alias("docid"), *PK, "lang", "segment",
        F.col("n").alias("dl"),
        F.conv(F.hex(F.col("norms")), 16, 10).cast("int").alias("norm"),
        F.col("term").alias("content_sha256"),
    ).write.mode("overwrite").parquet(os.path.join(root, "docs"))
    idx.blocks().groupBy("term").agg(
        F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")
    ).write.mode("overwrite").parquet(os.path.join(root, "dict"))
    idx.dict().agg(F.sum("ttf")).collect()
    out["derived_sec"] = round(time.time() - t, 2)

    total = out["analyze_sec"] + out["docmap_sec"] + out["blocks_sec"] + out["derived_sec"]
    out["total_sec"] = round(total, 2)
    out["docs_per_sec"] = round(n / total, 1)

    if os.environ.get("LSS_UI") == "true":
        # aggregate task metrics per stage from the live UI REST API —
        # jvmGcTime vs executorRunTime separates GC pressure from real
        # work; executorDeserializeTime exposes task-launch overhead
        try:
            import urllib.request

            app_id = spark.sparkContext.applicationId
            url = (f"http://localhost:4040/api/v1/applications/{app_id}"
                   f"/stages?status=complete")
            stages = json.load(urllib.request.urlopen(url, timeout=10))
            rows = []
            for st in stages:
                rows.append({
                    "stage": st["stageId"],
                    "name": st["name"].split("\n")[0][:60],
                    "tasks": st["numCompleteTasks"],
                    "runtime_s": round(st["executorRunTime"] / 1e3, 1),
                    "gc_s": round(st["jvmGcTime"] / 1e3, 1),
                    "deser_s": round(st["executorDeserializeTime"] / 1e3, 1),
                    "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 1),
                })
            rows.sort(key=lambda r: -r["runtime_s"])
            out["stages"] = rows[:12]
        except Exception as e:  # pragma: no cover - diagnostics only
            out["stages_err"] = str(e)
    analyzed.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    print("CHILD_RESULT " + json.dumps(out))
    spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--dps", type=int, default=0,
                    help="docs per segment (0 = docs//64 legacy sizing)")
    ap.add_argument("--pin", action="store_true",
                    help="taskset the child to cpus 0..n-1")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()

    if args.child:
        child(args.cpus, args.docs, args.dps)
        return 0

    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--cpus", str(args.cpus), "--docs", str(args.docs),
           "--dps", str(args.dps)]
    env = dict(os.environ)
    if args.pin:
        cmd = ["taskset", "-c", f"0-{args.cpus - 1}"] + cmd
        env["LSS_PINNED"] = "1"
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600, env=env)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("CHILD_RESULT ")]
    if not line:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        return 1
    print(line[-1][len("CHILD_RESULT "):])
    return 0


if __name__ == "__main__":
    sys.exit(main())
