"""Near-real-time incremental indexing (Structured Streaming).

Reference model: Lucene NRT — new documents accumulate in DWPTs, a
soft-commit flushes them as new *segments* that become searchable on
reopen, and background tiered merges fold small segments together
(search/SearcherManager.java, index/ConcurrentMergeScheduler.java,
index/TieredMergePolicy.java:97-101; Solr's transaction-log topic pull
solr/core/.../update/UpdateLog.java, io/stream/TopicStream.java).

Spark-first rendering:
  * `readStream` over the corpus source; every micro-batch is one
    "flush": `foreachBatch` assigns the batch contiguous docids
    starting at the current doc_count (arrival order — exactly
    Lucene's sequential docID assignment), builds block-encoded
    segment rows with the SAME applyInPandas builder as the batch
    path (index/segments.py), and appends them under new segment ids.
  * the checkpointLocation is the transaction log: restart resumes
    the stream exactly-once, so docids stay gap-free.
  * `compact_segments` is the TieredMergePolicy analogue: segments
    smaller than `docs_per_segment/2` are re-keyed and re-encoded into
    full segments (a SegmentMerger.java:96-177 merge — docids are
    global, so merging is a re-bucket + re-encode with NO remapping).
  * searchers (`SegmentSearcher`) see each commit atomically on
    re-open — the Iceberg-snapshot role; with plain Parquet we append
    segment partitions then refresh.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..analysis import ENGLISH_STOP_WORDS
from ..index import codec
from ..index.builder import PK
from ..index.segments import BLOCKS_SCHEMA, SegmentIndex, _segment_builder


class IncrementalIndexer:
    """foreachBatch sink maintaining a SegmentIndex under `root`."""

    def __init__(self, root: str,
                 stop_words: frozenset[str] | None = ENGLISH_STOP_WORDS,
                 max_token_length: int = 255,
                 docs_per_segment: int = 4096):
        self.root = root
        self.stop_words = stop_words or frozenset()
        self.max_token_length = max_token_length
        self.docs_per_segment = docs_per_segment
        os.makedirs(root, exist_ok=True)

    # -- state ----------------------------------------------------------
    @property
    def manifest_path(self):
        return os.path.join(self.root, "manifest.json")

    def _load_state(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"format_version": 2, "doc_count": 0, "sum_ttf": 0,
                "n_segments": 0, "docs_per_segment": self.docs_per_segment,
                "block_size": codec.BLOCK_SIZE,
                "stop_words": sorted(self.stop_words),
                "max_token_length": self.max_token_length,
                "n_chunks": 0, "streaming": True}

    # -- the flush (one micro-batch = one soft commit) -------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        state = self._load_state()
        base_docid = int(state["doc_count"])
        base_segment = int(state["n_segments"])
        dps = int(state["docs_per_segment"])

        rows = batch_df.select(*PK, "lang", "content")
        n = rows.count()
        if n == 0:
            return
        # deterministic within-batch docids: rank by PK (arrival batch
        # defines the coarse order, PK the fine order — Lucene assigns
        # by arrival too). Batches are small (one flush): a single-
        # partition sort is the DWPT's in-memory sort, but we keep it
        # distributed via range partitioning.
        from ..index.builder import assign_docids

        with_ids = assign_docids(rows).withColumn(
            "docid", F.col("docid") + F.lit(base_docid))
        with_ids = with_ids.withColumn(
            "segment",
            (F.col("docid") / dps).cast("int") + F.lit(
                # new segments never share ids with existing ones
                base_segment - base_docid // dps),
        )
        builder = _segment_builder(self.stop_words, self.max_token_length, dps)
        out = with_ids.groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)
        out.write.mode("append").partitionBy("segment").parquet(
            os.path.join(self.root, "blocks"))
        # docmap append (lineage) — segment-pure files, matching the
        # batch builder's layout (segments.py shuffle-free read path)
        with_ids.repartition(F.col("segment")).write.mode("append").partitionBy(
            "segment").parquet(os.path.join(self.root, "docmap"))

        idx = SegmentIndex(self.root, spark)
        self._refresh_derived(idx)
        parent = getattr(with_ids, "_lss_persisted_parent", None)
        if parent is not None:
            parent.unpersist()

    def _refresh_derived(self, idx: SegmentIndex) -> None:
        """Recompute docs/dict/stats + manifest from blocks (the
        'reopen'). Incremental alternative at scale: MERGE INTO the
        dict delta; full recompute keeps the sandbox honest & simple."""
        spark = idx.spark
        idx.summaries().select(
            F.col("first_docid").alias("docid"), *PK, "lang", "segment",
            F.col("n").alias("dl"),
            F.conv(F.hex(F.col("norms")), 16, 10).cast("int").alias("norm"),
            F.col("term").alias("content_sha256"),
        ).write.mode("overwrite").parquet(os.path.join(self.root, "docs.tmp"))
        blocks = idx.blocks()
        blocks.groupBy("term").agg(
            F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")
        ).write.mode("overwrite").parquet(os.path.join(self.root, "dict.tmp"))

        # atomic-ish swap (Iceberg snapshot commit analogue)
        for name in ("docs", "dict"):
            final = os.path.join(self.root, name)
            tmp = os.path.join(self.root, name + ".tmp")
            if os.path.exists(final):
                import shutil

                shutil.rmtree(final)
            os.rename(tmp, final)

        docs = spark.read.parquet(os.path.join(self.root, "docs"))
        agg = docs.agg(F.count("*").alias("c"), F.sum("dl").alias("s")).collect()[0]
        n_segments = idx.blocks().agg(
            F.max("segment").alias("m")).collect()[0]["m"]
        spark.createDataFrame(
            [(int(agg["c"]), int(agg["s"] or 0))], "doc_count long, sum_ttf long"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(self.root, "stats"))
        state = self._load_state()
        state.update(doc_count=int(agg["c"]), sum_ttf=int(agg["s"] or 0),
                     n_segments=int(n_segments) + 1,
                     updated_wall=round(time.time(), 3))
        with open(self.manifest_path, "w") as f:
            json.dump(state, f, indent=1)

    # -- stream wiring ---------------------------------------------------
    def start(self, stream_df: DataFrame, checkpoint: str, trigger: dict | None = None):
        """Attach to a streaming DataFrame of corpus rows. `trigger`
        e.g. {"availableNow": True} for drain-and-stop, or
        {"processingTime": "30 seconds"} for continuous NRT."""
        w = stream_df.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint)
        if trigger:
            w = w.trigger(**trigger)
        return w.start()


def compact_segments(idx: SegmentIndex, min_fill: float = 0.5) -> int:
    """Tiered-merge analogue: re-encode underfull segments into full
    ones (TieredMergePolicy.java:97-101 role). docids are global, so a
    merge is re-keying by docid//docs_per_segment + re-encoding — no
    docID remapping (unlike SegmentMerger.java:96-177, whose remap
    exists only because Lucene docids are per-segment). Returns the
    number of segments after compaction."""
    spark = idx.spark
    m = idx.manifest()
    dps = int(m["docs_per_segment"])
    seg_sizes = {
        int(r["segment"]): int(r["n"])
        for r in idx.summaries().groupBy("segment").agg(
            F.count("*").alias("n")).collect()
    }
    small = sorted(s for s, n in seg_sizes.items() if n < dps * min_fill)
    if len(small) <= 1:
        return len(seg_sizes)

    stop = frozenset(m.get("stop_words", ()))
    builder = _segment_builder(stop, int(m["max_token_length"]), dps)
    docmap = idx.docmap()
    if "content" not in docmap.columns:
        raise ValueError(
            "compaction needs document content: this index's docmap is "
            "slim (batch build) — re-run build_segment_index with a "
            "larger docs_per_segment instead, or compact from the "
            "source corpus table")
    merged_src = docmap.where(F.col("segment").isin(small))
    # re-key: pack the merged docs into the FEWEST segments, reusing
    # ids from `small` (never colliding with surviving full segments).
    # The global row_number window is safe here: only underfull
    # segments flow through it (bounded rows), not the whole index.
    seg_ids = F.array(*[F.lit(s) for s in small])
    w_ids = (
        merged_src.withColumn(
            "_rk", F.row_number().over(Window.orderBy("docid")) - 1)
        .withColumn(
            "segment",
            F.element_at(seg_ids, (F.col("_rk") / dps).cast("int") + 1))
        .drop("_rk")
    )
    out = w_ids.groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)
    tmp = os.path.join(idx.root, "blocks.compact.tmp")
    out.write.mode("overwrite").partitionBy("segment").parquet(tmp)
    # swap: drop old small segment dirs, move in compacted ones
    import shutil

    for s in small:
        p = os.path.join(idx.blocks_path, f"segment={s}")
        if os.path.exists(p):
            shutil.rmtree(p)
    for d in os.listdir(tmp):
        if d.startswith("segment="):
            os.rename(os.path.join(tmp, d), os.path.join(idx.blocks_path, d))
    shutil.rmtree(tmp)
    # docmap segment column is stale for moved docs; rebuild it
    new_map = docmap.drop("segment").join(
        idx.summaries().select(F.col("first_docid").alias("docid"),
                               F.col("segment")),
        "docid",
    )
    new_map.repartition(F.col("segment")).write.mode("overwrite").partitionBy(
        "segment").parquet(os.path.join(idx.root, "docmap.tmp"))
    shutil.rmtree(idx.docmap_path)
    os.rename(os.path.join(idx.root, "docmap.tmp"), idx.docmap_path)
    return len({int(r["segment"]) for r in
                idx.blocks().select("segment").distinct().collect()})
