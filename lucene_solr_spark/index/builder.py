"""Distributed inverted-index build (the write path).

Spark-first reimplementation of Lucene's indexing chain
(index/DefaultIndexingChain.java:385-441, DWPT model
index/DocumentsWriterPerThread.java:230): each input partition plays
the role of a DocumentsWriterPerThread — it tokenizes its documents
and emits fully-aggregated per-(doc,term) posting rows *locally*
(a document lives in exactly one partition, so posting aggregation
needs NO shuffle). Tokenization runs exactly once per document; the
same pass emits one per-doc summary row (dl, norm, sha256) so the
docs table costs no second tokenize.

Shuffle inventory — the whole point at 100 TB:
  1. repartitionByRange by primary key for deterministic global docID
     assignment (Lucene: per-segment sequential IDs; here: global rank
     over (repo,path,commit) — NOT monotonically_increasing_id, which
     is partition-layout dependent, and NOT a global Window, which
     collapses to one partition);
  2. the "segment merge" — one exchange of posting rows into the
     term-bucket layout (SegmentMerger.java:96-177 played by a single
     repartition), salted by docID block so one hot term spreads over
     many tasks/files (skew handling);
  3. a slim docid-keyed join (ndocs rows) assembling the docs table;
  4. tiny aggregations: term dictionary (term → df, ttf — the
     BlockTreeTermsWriter stats role, BlockTreeTermsWriter.java:223-239)
     with map-side partial agg, and one-row collection stats.

Output layout (Parquet here; Iceberg in production — partition columns
become the partition spec, manifest.json becomes snapshot metadata):

  docs/      (docid, repo, path, commit, lang, dl, norm, content_sha256)
  postings/  bucket=NN/ (term, docid, tf, positions, norm) sorted by (term, docid)
  dict/      (term, df, ttf, bucket)
  stats/     single row (doc_count, sum_ttf)
  manifest.json  build config + invariants

Norm bytes are denormalized into posting rows: BM25 scoring needs
(tf, norm) per hit (BM25Similarity.java:223-226), and colocating them
removes a docs-join from every query — 1 logical byte per row.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis import ENGLISH_STOP_WORDS
from ..analysis.jvm import analyzed_columns

PK = ["repo", "path", "commit"]

# kind=0: posting row. kind=1: per-doc summary (term carries sha256 hex,
# tf carries dl, positions null).
SEGMENT_SCHEMA = (
    "term string, docid long, tf int, positions array<int>, norm int, kind int"
)


def num_term_buckets(default: int = 32) -> int:
    return int(os.environ.get("LSS_TERM_BUCKETS", default))


def term_bucket_expr(col, n_buckets: int):
    """Deterministic term → bucket; crc32 here == zlib.crc32 on the
    query side (verified in tests)."""
    return F.pmod(F.crc32(col.cast("string")), F.lit(n_buckets)).cast("int")


def assign_docids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic global docIDs: rank of (repo,path,commit) in total
    key order.

    Scale path: range-partition by key, sort within partitions, collect
    only the per-partition COUNTS (P longs) to the driver, assign
    docid = cumulative_offset[pid] + local_index via mapInPandas. The
    rank is independent of the sampled range boundaries, so the
    assignment is deterministic for a given input set. Caller is
    responsible for persisting the result if reused.
    """
    spark = corpus.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)

    # Entirely JVM-side: the local row index comes from decomposing
    # monotonically_increasing_id (pid * 2^33 + index-in-partition —
    # deterministic here because the partitioning AND the within-
    # partition order are pinned by repartitionByRange + a total
    # per-partition sort on the unique PK). A Python attach stage here
    # would chain a second Python runner into every downstream
    # pandas-UDF task — worker-pool churn that collapsed build scaling
    # at high core counts (round-2 diagnosis).
    sorted_df = (
        corpus.repartitionByRange(num_partitions, *PK)
        .sortWithinPartitions(*PK)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
    )
    sorted_df.persist(StorageLevel.MEMORY_AND_DISK)
    counts = {r["_pid"]: r["cnt"] for r in
              sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")

    result = (
        sorted_df.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "docid",
            F.col("_off")
            + (F.col("_mid") - F.col("_pid").cast("long") * F.lit(1 << 33)),
        )
        .drop("_pid", "_mid", "_off")
    )
    # note: sorted_df stays persisted until result is consumed; caller
    # unpersists via IndexTables lifecycle (build_index handles it).
    result._lss_persisted_parent = sorted_df  # type: ignore[attr-defined]
    return result


def _make_segment_fn(stop_words: frozenset[str] = frozenset()):
    """Per-partition DWPT: pre-tokenized doc batch → aggregated posting
    rows plus one summary row per doc.

    Input rows carry ``tokens``/``content_sha256`` from
    :func:`..analysis.jvm.analyzed_columns` (tokenization is JVM-side);
    this worker is pure vectorized numpy: the StopFilter is one isin
    mask over the factorized vocabulary (position = raw token index →
    stopword gaps preserved, dl counts survivors), then ONE stable
    sort yields the (term, doc) posting runs; tfs and position slices
    come from numpy boundary math."""
    stop_arr = np.asarray(sorted(stop_words), dtype=object) if stop_words else None

    def build_segment(batches):
        from ..util.smallfloat import int_to_byte4_np

        for pdf in batches:
            docids = pdf["docid"].to_numpy(dtype=np.int64)
            ndocs = len(pdf)

            toks_col = pdf["tokens"].to_numpy()
            raw_lens = np.fromiter((len(t) for t in toks_col), dtype=np.int64,
                                   count=ndocs)
            total_raw = int(raw_lens.sum())
            shas = pdf["content_sha256"].tolist()

            if total_raw:
                flat_raw = np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks_col])
                doc_of_tok = np.repeat(np.arange(ndocs), raw_lens)
                starts = np.zeros(ndocs, dtype=np.int64)
                np.cumsum(raw_lens[:-1], out=starts[1:])
                pos_raw = np.arange(total_raw, dtype=np.int64) - starts[doc_of_tok]
                codes_all, uniq = pd.factorize(flat_raw, sort=False)
                codes_all = np.asarray(codes_all)
                uniq = np.asarray(uniq, dtype=object)
                if stop_arr is not None and len(uniq):
                    keep = ~np.isin(uniq, stop_arr)[codes_all]
                    codes = codes_all[keep]
                    tok_didx = doc_of_tok[keep]
                    flat_pos = pos_raw[keep]
                else:
                    codes, tok_didx, flat_pos = codes_all, doc_of_tok, pos_raw
                dls = np.bincount(tok_didx, minlength=ndocs).astype(np.int64)
            else:
                dls = np.zeros(ndocs, dtype=np.int64)
            norms_doc = int_to_byte4_np(dls).astype(np.int64)

            summary = pd.DataFrame({
                "term": shas, "docid": docids, "tf": dls,
                "positions": None, "norm": norms_doc, "kind": 1,
            })

            total = int(dls.sum())
            if total == 0:
                yield summary
                continue

            order = np.argsort(codes, kind="stable")
            codes_s, didx_s, pos_s = codes[order], tok_didx[order], flat_pos[order]

            new_post = np.empty(total, dtype=bool)
            new_post[0] = True
            new_post[1:] = (codes_s[1:] != codes_s[:-1]) | (didx_s[1:] != didx_s[:-1])
            post_starts = np.flatnonzero(new_post)
            tf = np.append(post_starts[1:], total) - post_starts
            post_didx = didx_s[post_starts]

            postings = pd.DataFrame({
                "term": uniq[codes_s[post_starts]],
                "docid": docids[post_didx],
                "tf": tf,
                "positions": np.split(pos_s, post_starts[1:]),
                "norm": norms_doc[post_didx],
                "kind": 0,
            })
            yield pd.concat([postings, summary], ignore_index=True)

    return build_segment


@dataclass
class IndexTables:
    root: str
    spark: SparkSession

    @property
    def postings_path(self):
        return os.path.join(self.root, "postings")

    @property
    def docs_path(self):
        return os.path.join(self.root, "docs")

    @property
    def dict_path(self):
        return os.path.join(self.root, "dict")

    @property
    def stats_path(self):
        return os.path.join(self.root, "stats")

    @property
    def manifest_path(self):
        return os.path.join(self.root, "manifest.json")

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(self.postings_path)

    def docs(self) -> DataFrame:
        return self.spark.read.parquet(self.docs_path)

    def dict(self) -> DataFrame:
        return self.spark.read.parquet(self.dict_path)

    def stats(self) -> dict:
        row = self.spark.read.parquet(self.stats_path).collect()[0]
        return row.asDict()

    def manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)


def build_index(
    corpus: DataFrame,
    out_root: str,
    stop_words: frozenset[str] | None = ENGLISH_STOP_WORDS,
    max_token_length: int = 255,
    n_buckets: int | None = None,
    build_partitions: int | None = None,
) -> IndexTables:
    """Full index build. See module docstring for the plan & shuffles."""
    spark = corpus.sparkSession
    t0 = time.time()
    if n_buckets is None:
        n_buckets = num_term_buckets()
    stop_words = stop_words or frozenset()
    os.makedirs(out_root, exist_ok=True)

    base = assign_docids(corpus, build_partitions)
    parent = getattr(base, "_lss_persisted_parent", None)
    analyzed = analyzed_columns(
        base, max_token_length=max_token_length).drop("content")
    analyzed.persist(StorageLevel.MEMORY_AND_DISK)

    segments = analyzed.mapInPandas(_make_segment_fn(stop_words), schema=SEGMENT_SCHEMA)
    segments.persist(StorageLevel.MEMORY_AND_DISK)

    # --- postings: merge to term-bucket layout --------------------------
    merged = (
        segments.where(F.col("kind") == 0)
        .drop("kind")
        .withColumn("bucket", term_bucket_expr(F.col("term"), n_buckets))
        .withColumn("_salt", F.pmod(F.col("docid"), F.lit(8)).cast("int"))
        .repartition(F.col("bucket"), F.col("_salt"))
        .drop("_salt")
        .sortWithinPartitions("term", "docid")
    )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_root, "postings")
    )

    # --- docs table: summary rows ⋈ slim metadata ------------------------
    summaries = (
        segments.where(F.col("kind") == 1)
        .select(F.col("docid"), F.col("tf").alias("dl"), F.col("norm"),
                F.col("term").alias("content_sha256"))
    )
    meta = analyzed.select("docid", *PK, "lang")
    docs = meta.join(summaries, "docid").select(
        "docid", *PK, "lang", "dl", "norm", "content_sha256"
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_root, "docs"))

    tables = IndexTables(out_root, spark)

    # --- dictionary + collection stats ----------------------------------
    postings = tables.postings()
    dict_df = postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("ttf"),
        F.first("bucket").alias("bucket"),
    )
    dict_df.write.mode("overwrite").parquet(os.path.join(out_root, "dict"))

    tables.docs().agg(
        F.count("*").alias("doc_count"), F.sum("dl").alias("sum_ttf")
    ).write.mode("overwrite").parquet(os.path.join(out_root, "stats"))

    st = tables.stats()
    manifest = {
        "format_version": 1,
        "doc_count": st["doc_count"],
        "sum_ttf": int(st["sum_ttf"] or 0),
        "n_buckets": n_buckets,
        "stop_words": sorted(stop_words),
        "max_token_length": max_token_length,
        "build_wall_sec": round(time.time() - t0, 3),
    }
    with open(os.path.join(out_root, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)

    segments.unpersist()
    analyzed.unpersist()
    if parent is not None:
        parent.unpersist()
    return tables
