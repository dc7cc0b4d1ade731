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
from ..analysis.jvm import analyzed_columns
from ..index import codec
from ..index.builder import PK
from ..index.segments import (
    BLOCKS_SCHEMA,
    SegmentIndex,
    _segment_builder,
    append_deletes,
)


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
        """One micro-batch = one segment flush. Idempotent under
        foreachBatch's at-least-once contract: already-committed batch
        ids (recorded in the manifest at refresh time) are skipped, and
        block/docmap output stages under a batch-scoped tmp dir that
        moves into place per segment — a batch retried after a crash
        overwrites its own segment dirs instead of appending duplicate
        rows."""
        spark = batch_df.sparkSession
        state = self._load_state()
        if batch_id <= int(state.get("last_batch_id", -1)):
            return  # retry of a committed batch (at-least-once replay)
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

        base = assign_docids(rows)
        # capture the persisted parent NOW: DataFrame transformations do
        # not propagate Python attributes, so reading it off with_ids
        # later would leak one cached corpus copy per micro-batch
        parent = getattr(base, "_lss_persisted_parent", None)
        with_ids = base.withColumn(
            "docid", F.col("docid") + F.lit(base_docid))
        with_ids = with_ids.withColumn(
            "segment",
            (F.col("docid") / dps).cast("int") + F.lit(
                # new segments never share ids with existing ones
                base_segment - base_docid // dps),
        )
        builder = _segment_builder(dps, self.stop_words)
        analyzed = analyzed_columns(
            with_ids, max_token_length=self.max_token_length).drop("content")
        out = analyzed.groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)

        # stage under a batch-scoped dir, then move segment dirs into
        # place (segment ids are batch-exclusive — each batch starts at
        # the manifest's n_segments — so a move never interleaves rows
        # from two batches; a retry replaces its own partial dirs)
        import shutil

        tmp = os.path.join(self.root, f"batch-{batch_id}.tmp")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        out.write.mode("overwrite").partitionBy("segment").parquet(
            os.path.join(tmp, "blocks"))
        # docmap (lineage) — segment-pure files, matching the batch
        # builder's layout (segments.py shuffle-free read path)
        with_ids.repartition(F.col("segment")).write.mode("overwrite").partitionBy(
            "segment").parquet(os.path.join(tmp, "docmap"))
        for name in ("blocks", "docmap"):
            dst_root = os.path.join(self.root, name)
            os.makedirs(dst_root, exist_ok=True)
            src_root = os.path.join(tmp, name)
            for d in os.listdir(src_root):
                if not d.startswith("segment="):
                    continue
                dst = os.path.join(dst_root, d)
                if os.path.exists(dst):  # partial dir from a crashed try
                    shutil.rmtree(dst)
                os.rename(os.path.join(src_root, d), dst)
        shutil.rmtree(tmp)

        idx = SegmentIndex(self.root, spark)
        new_segments = sorted(
            r["segment"] for r in
            out.sparkSession.read.parquet(os.path.join(self.root, "blocks"))
            .select("segment").where(
                F.col("segment") >= base_segment).distinct().collect())
        self._refresh_derived(idx, batch_id=batch_id, new_segments=new_segments)
        if parent is not None:
            parent.unpersist()

    def _docs_select(self, summaries: DataFrame) -> DataFrame:
        return summaries.select(
            F.col("first_docid").alias("docid"), *PK, "lang", "segment",
            F.col("n").alias("dl"),
            F.conv(F.hex(F.col("norms")), 16, 10).cast("int").alias("norm"),
            F.col("term").alias("content_sha256"),
        )

    def _refresh_derived(self, idx: SegmentIndex, batch_id: int | None = None,
                         new_segments: list[int] | None = None) -> None:
        """Refresh docs/dict/stats + manifest (the 'reopen').

        Incremental when possible: the docs delta (only the NEW
        segments' summaries) lands in a batch-scoped partition dir, and
        the dict is a merge of the existing dict with the new segments'
        term aggregate — per-batch cost is O(batch + vocabulary), not
        O(index) (round-1 quadratic-ingest finding). Idempotence: the
        dict dir carries a ``_delta_batch`` marker, and the docs delta
        dir is replaced wholesale on a retried batch. Falls back to a
        full recompute from blocks when no prior derived tables exist
        (first batch) or no segment list was provided (compaction)."""
        import shutil

        spark = idx.spark
        docs_root = os.path.join(self.root, "docs")
        dict_root = os.path.join(self.root, "dict")
        marker = os.path.join(dict_root, "_delta_batch")

        incremental = bool(
            batch_id is not None and new_segments
            and os.path.exists(docs_root) and os.path.exists(dict_root))
        if incremental:
            seg_pred = F.col("segment").isin([int(s) for s in new_segments])
            # docs delta → docs/batch=<id>/ (replace-on-retry)
            tmp = os.path.join(self.root, "docs.delta.tmp")
            self._docs_select(idx.summaries().where(seg_pred)).write.mode(
                "overwrite").parquet(tmp)
            dst = os.path.join(docs_root, f"batch={batch_id}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.rename(tmp, dst)
            # dict merge (skip if this batch's delta is already in)
            applied = -1
            if os.path.exists(marker):
                with open(marker) as f:
                    applied = int(f.read().strip() or -1)
            if applied != batch_id:
                delta = idx.blocks().where(seg_pred).groupBy("term").agg(
                    F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf"))
                old = spark.read.parquet(dict_root)
                merged = old.unionByName(delta).groupBy("term").agg(
                    F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
                dtmp = os.path.join(self.root, "dict.tmp")
                merged.write.mode("overwrite").parquet(dtmp)
                with open(os.path.join(dtmp, "_delta_batch"), "w") as f:
                    f.write(str(batch_id))
                shutil.rmtree(dict_root)
                os.rename(dtmp, dict_root)
        else:
            # full recompute from blocks; docs live under batch=<id> so
            # later incremental deltas can append partition dirs
            self._docs_select(idx.summaries()).write.mode("overwrite").parquet(
                os.path.join(self.root, "docs.tmp"))
            idx.blocks().groupBy("term").agg(
                F.sum("n").alias("df"), F.sum("sum_tf").alias("ttf")
            ).write.mode("overwrite").parquet(os.path.join(self.root, "dict.tmp"))
            for name in ("docs", "dict"):
                final = os.path.join(self.root, name)
                tmp = os.path.join(self.root, name + ".tmp")
                if os.path.exists(final):
                    shutil.rmtree(final)
                if name == "docs":
                    os.makedirs(final, exist_ok=True)
                    os.rename(tmp, os.path.join(
                        final, f"batch={-1 if batch_id is None else batch_id}"))
                else:
                    os.rename(tmp, final)

        if incremental:
            # O(batch) stats maintenance: aggregate ONLY the delta and
            # add to the manifest's committed running counters (the
            # manifest is written atomically with last_batch_id below,
            # so a retried half-applied batch always adds its delta to
            # the PRE-batch committed base — never double-counts).
            # Tombstoned docs keep counting until compaction (Lucene
            # docCount-vs-liveDocs), so additive deltas stay exact;
            # the compaction path below recomputes from scratch.
            committed = self._load_state()
            dagg = (spark.read.parquet(os.path.join(docs_root,
                                                    f"batch={batch_id}"))
                    .agg(F.count("*").alias("c"),
                         F.sum("dl").alias("s")).collect()[0])
            agg = {"c": int(committed.get("doc_count", 0)) + int(dagg["c"]),
                   "s": (int(committed.get("sum_ttf", 0))
                         + int(dagg["s"] or 0))}
        else:
            docs = idx.docs()
            agg = docs.agg(F.count("*").alias("c"),
                           F.sum("dl").alias("s")).collect()[0]
        if new_segments:
            n_segments = max(int(self._load_state().get("n_segments", 0)) - 1,
                             max(new_segments))
        else:
            n_segments = idx.blocks().agg(
                F.max("segment").alias("m")).collect()[0]["m"]
        spark.createDataFrame(
            [(int(agg["c"]), int(agg["s"] or 0))], "doc_count long, sum_ttf long"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(self.root, "stats"))
        state = self._load_state()
        state.update(doc_count=int(agg["c"]), sum_ttf=int(agg["s"] or 0),
                     n_segments=int(n_segments) + 1,
                     updated_wall=round(time.time(), 3))
        if batch_id is not None:
            state["last_batch_id"] = int(batch_id)  # the commit record
        with open(self.manifest_path, "w") as f:
            json.dump(state, f, indent=1)

    # -- updates / deletes ----------------------------------------------
    def delete_by_key(self, spark, keys_df: DataFrame,
                      key_cols: tuple[str, ...] = ("repo", "path"),
                      max_docid: int | None = None) -> int:
        """Tombstone every indexed doc whose key matches a row of
        ``keys_df`` (delete-by-term, index/DocumentsWriter.java:476-494
        semantics): resolve docids from the docmap, append to the
        tombstone table. Deleted docs stop matching immediately
        (liveDocs anti-join/mask in both searchers); their postings are
        physically dropped at the next compaction.

        ``max_docid`` bounds the resolution to docids < max_docid —
        upsert_batch passes the manifest's committed doc_count so a
        retried half-applied batch never tombstones its own rows (a
        crashed attempt may have moved docmap segment dirs into place
        before committing; those rows carry docids >= the committed
        doc_count)."""
        idx = SegmentIndex(self.root, spark)
        if not os.path.exists(idx.docmap_path):
            return 0
        dm = idx.docmap()
        if max_docid is not None:
            dm = dm.where(F.col("docid") < int(max_docid))
        hits = (dm
                .join(keys_df.select(*key_cols).distinct(),
                      list(key_cols), "left_semi")
                .select("docid").collect())
        return append_deletes(self.root, [r["docid"] for r in hits])

    def delete_by_query(self, spark, predicate: str) -> int:
        """deleteByQuery over the stored-fields surface (Solr
        delete-by-query / DocExpirationUpdateProcessorFactory.java's
        periodic ``deleteByQuery(ttl_field:[* TO NOW])`` sweep): every
        live doc whose docs-table row satisfies ``predicate`` (a SQL
        boolean expression over docid/repo/path/commit/lang/dl) is
        tombstoned. One filtered scan; postings drop at compaction."""
        idx = SegmentIndex(self.root, spark)
        docs_root = os.path.join(self.root, "docs")
        if not os.path.exists(docs_root):
            return 0
        hits = idx.docs().where(F.expr(predicate)).select("docid")
        dels = idx.deletes()
        if dels is not None:
            hits = hits.join(dels, "docid", "left_anti")
        return append_deletes(self.root,
                              [r["docid"] for r in hits.collect()])

    def add_batch_dedup(self, batch_df: DataFrame, batch_id: int,
                        key_cols: tuple[str, ...] = ("repo", "path"),
                        ) -> None:
        """SignatureUpdateProcessorFactory (exact signature dedup at
        index time, solr/core/.../processor/
        SignatureUpdateProcessorFactory.java + MD5Signature): drop
        incoming docs whose content signature already exists in the
        index, and collapse in-batch duplicates to one row (first by
        ``key_cols`` — deterministic, the overwriteDupes=false "leave
        the existing doc" mode). Signature = sha256(content), the
        docs table's per-row invariant column, so the against-index
        check is ONE anti-join on an indexed column — the index-time
        rendering of the pipeline's exact-dedup op."""
        from pyspark.sql.window import Window

        sig = F.sha2(F.col("content"), 256)
        rows = batch_df.withColumn("_sig", sig)
        w = Window.partitionBy("_sig").orderBy(*key_cols)
        rows = (rows.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1).drop("_rn"))
        docs_root = os.path.join(self.root, "docs")
        if os.path.exists(docs_root):
            idx = SegmentIndex(self.root, batch_df.sparkSession)
            existing = idx.docs().select(
                F.col("content_sha256").alias("_sig"))
            dels = idx.deletes()
            if dels is not None:
                existing = (idx.docs().join(dels, "docid", "left_anti")
                            .select(F.col("content_sha256").alias("_sig")))
            rows = rows.join(existing, "_sig", "left_anti")
        self.process_batch(rows.drop("_sig"), batch_id)

    def upsert_batch(self, batch_df: DataFrame, batch_id: int,
                     key_cols: tuple[str, ...] = ("repo", "path")) -> None:
        """updateDocument = delete-by-term + add
        (index/DocumentsWriter.java:476-494; Solr NRT re-ingest / the
        `MERGE INTO` role keyed on ``key_cols``): tombstone any older
        version of each incoming doc, then flush the batch as new
        segments with fresh docids. Idempotent like process_batch —
        a committed batch_id is skipped entirely, and tombstone
        resolution is bounded to docids below the COMMITTED doc_count:
        a retry of a half-applied batch (crash after the docmap
        segment dirs moved into place, before the manifest commit)
        would otherwise resolve the batch's own just-ingested rows and
        tombstone the very docids process_batch deterministically
        re-assigns."""
        state = self._load_state()
        if batch_id <= int(state.get("last_batch_id", -1)):
            return
        self.delete_by_key(batch_df.sparkSession, batch_df, key_cols,
                           max_docid=int(state.get("doc_count", 0)))
        self.process_batch(batch_df, batch_id)

    def atomic_update(self, spark, ops_df: DataFrame, batch_id: int,
                      ops: dict[str, str],
                      key_cols: tuple[str, ...] = ("repo", "path"),
                      ) -> int:
        """Solr atomic updates: partial-document field operations
        merged against the LATEST stored version, then re-ingested as
        an update (AtomicUpdateDocumentMerger.merge,
        solr/core/src/java/org/apache/solr/update/processor/
        AtomicUpdateDocumentMerger.java:91-130 — op dispatch
        set/add/remove/inc at :100-116, doSet/doAdd/doInc/doRemove at
        :315-399; like Solr, requires the fields to be stored — here
        the docmap is the stored-fields table).

        ``ops_df`` carries ``key_cols`` plus one operand column per
        updated field; ``ops`` maps field → one of:

        * ``set`` — replace with the operand (doSet),
        * ``inc`` — numeric increment (doInc),
        * ``add`` — append to an array field (doAdd),
        * ``remove`` — drop matching values from an array field
          (doRemove).

        Keys not currently live are skipped (counted in the return) —
        an atomic op against a missing doc has nothing to merge.
        Returns the number of docs updated. The merge is one broadcast
        point-lookup join (realtime_get) + a per-field Catalyst
        projection; the re-ingest is the ordinary upsert path
        (tombstone + new segment), so concurrency/idempotence
        guarantees are inherited from upsert_batch."""
        # fetch everything the re-ingest needs: the full PK (docmap
        # keys can be a subset of it, e.g. repo+path vs repo+path+
        # commit), the stored fields, and every op target
        current = self.realtime_get(
            spark, ops_df, key_cols,
            fields=tuple(dict.fromkeys(
                [*(c for c in PK if c not in key_cols),
                 "lang", "content", *ops])))
        operands = ops_df.select(
            *key_cols, *[F.col(f).alias(f"_op_{f}") for f in ops])
        base = current.drop("docid").join(operands, list(key_cols))
        base.persist()
        n_hit = base.count()
        merged = base
        for f, op in ops.items():
            cur, new = F.col(f), F.col(f"_op_{f}")
            if op == "set":
                val = new
            elif op == "inc":
                val = (F.coalesce(cur.cast("double"), F.lit(0.0))
                       + new.cast("double"))
            elif op == "add":
                val = F.concat(F.coalesce(cur, F.array()),
                               F.array(new))
            elif op == "remove":
                val = F.array_remove(F.coalesce(cur, F.array()), new)
            else:
                raise ValueError(f"unknown atomic op {op!r} for {f!r}")
            merged = merged.withColumn(f, val)
        merged = merged.drop(*[f"_op_{f}" for f in ops])
        try:
            if n_hit:
                self.upsert_batch(merged, batch_id, key_cols)
        finally:
            base.unpersist()
        # Solr raises on atomic ops against missing docs (no base to
        # merge); callers see the miss as n_hit < len(requested keys)
        return n_hit

    def realtime_get(self, spark, keys_df: DataFrame,
                     key_cols: tuple[str, ...] = ("repo", "path"),
                     fields: tuple[str, ...] = ("lang", "content"),
                     ) -> DataFrame:
        """RealTimeGetComponent (solr/core/src/java/org/apache/solr/
        handler/component/RealTimeGetComponent.java role): fetch the
        LATEST version of each requested key, reflecting every applied
        update — upserts and deletes included — without waiting for a
        compaction ('commit'). Resolution order mirrors the
        reference's ulog-then-index lookup: the docmap holds every
        ingested version (newer versions have higher docids, Lucene
        arrival order), tombstoned docids are masked, and the max
        surviving docid per key wins. Returns (key_cols..., docid,
        fields...); keys never indexed or fully deleted yield no row.

        Plan: keys are a point-lookup set — broadcast semi-join into
        the docmap scan; the per-key max is a window over the matched
        rows only."""
        idx = SegmentIndex(self.root, spark)
        if not os.path.exists(idx.docmap_path):
            return spark.createDataFrame(
                [], ", ".join(f"{c} string" for c in key_cols)
                + ", docid long")
        dm = idx.docmap()
        sel = [*key_cols, "docid"] + [f for f in fields
                                      if f in dm.columns]
        hits = dm.select(*sel).join(
            F.broadcast(keys_df.select(*key_cols).distinct()),
            list(key_cols), "left_semi")
        dels = idx.deletes()
        if dels is not None:
            hits = hits.join(dels, "docid", "left_anti")
        w = Window.partitionBy(*key_cols).orderBy(F.desc("docid"))
        return (hits.withColumn("_r", F.row_number().over(w))
                .where(F.col("_r") == 1).drop("_r"))

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


def tiered_merge_plan(seg_sizes: dict[int, int],
                      segs_per_tier: int = 10,
                      max_merged_docs: int | None = None,
                      floor_docs: int = 1) -> list[list[int]]:
    """TieredMergePolicy.findMerges (index/TieredMergePolicy.java) over
    segment DOC counts (our size unit; Lucene's is bytes).

    Faithful shape: (1) the allowed segment budget comes from the tier
    geometry — segsPerTier segments per level, level size growing by
    the merge factor (== segsPerTier; TieredMergePolicy.java:386-403
    allowedSegCount loop, floored at `floor_docs` like floorSegmentMB);
    (2) while over budget, candidate merges are windows of up to
    segsPerTier consecutive segments in size-descending order, capped
    at `max_merged_docs` (maxMergedSegmentMB role), scored by
    skew * totAfterMerge^0.05 (java:519-547 score()) and the
    LOWEST-scoring window merges first (smaller + more uniform wins).

    Returns groups of segment ids to merge (possibly several)."""
    import math

    if not seg_sizes:
        return []
    sizes = sorted(seg_sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(n for _, n in sizes)
    # allowed segment budget from tier geometry
    allowed, remaining, level = 0, total, max(floor_docs, 1)
    while True:
        count_at_level = remaining / level
        if count_at_level < segs_per_tier:
            allowed += math.ceil(count_at_level)
            break
        allowed += segs_per_tier
        remaining -= segs_per_tier * level
        level *= segs_per_tier
    plan: list[list[int]] = []
    pool = sizes
    while len(pool) > max(allowed, 1):
        best, best_score = None, None
        for lo in range(len(pool)):
            group, tot = [], 0
            for seg, n in pool[lo:lo + segs_per_tier]:
                if max_merged_docs and tot + n > max_merged_docs and group:
                    break
                group.append((seg, n))
                tot += n
            if len(group) < 2:
                continue
            skew = group[0][1] / tot  # windows are size-desc: [0] is max
            score = skew * (tot ** 0.05)
            if best_score is None or score < best_score:
                best, best_score = group, score
        if best is None:
            break
        merged_ids = [s for s, _ in best]
        plan.append(sorted(merged_ids))
        chosen = set(merged_ids)
        pool = [(s, n) for s, n in pool if s not in chosen]
        # the merged result occupies one slot in the budget accounting
        pool.append((-len(plan), sum(n for _, n in best)))
        pool.sort(key=lambda kv: (-kv[1], kv[0]))
    # drop placeholder ids (negative) from any later group — they are
    # results of this very plan, not real segments
    return [[s for s in g if s >= 0] for g in plan if any(s >= 0 for s in g)]


def compact_segments(idx: SegmentIndex, min_fill: float = 0.5,
                     apply_deletes: bool = True,
                     policy: str = "min_fill",
                     segs_per_tier: int = 10) -> int:
    """Tiered-merge analogue: re-encode underfull segments into full
    ones (TieredMergePolicy.java:97-101 role). docids are global, so a
    merge is re-keying by docid//docs_per_segment + re-encoding — no
    docID remapping (unlike SegmentMerger.java:96-177, whose remap
    exists only because Lucene docids are per-segment). Tombstoned docs
    inside the merged segments are physically dropped (deletes applied
    at merge, FreqProxTermsWriter applyDeletes role) and their
    tombstones retired; derived tables + manifest stats refresh when
    deletes were applied. Returns the segment count after compaction."""
    spark = idx.spark
    m = idx.manifest()
    dps = int(m["docs_per_segment"])
    seg_sizes = {
        int(r["segment"]): int(r["n"])
        for r in idx.summaries().groupBy("segment").agg(
            F.count("*").alias("n")).collect()
    }
    deletes = idx.deletes() if apply_deletes else None
    if policy == "tiered":
        # budget + skew-scored windows (TieredMergePolicy.findMerges);
        # all planned groups rewrite together — the docid//dps re-key
        # merges adjacent ranges, so one rewrite realizes every group
        plan = tiered_merge_plan(seg_sizes, segs_per_tier=segs_per_tier,
                                 max_merged_docs=dps,
                                 floor_docs=max(dps // 50, 1))
        small = sorted({s for g in plan for s in g})
    else:
        small = sorted(s for s, n in seg_sizes.items() if n < dps * min_fill)
    if deletes is not None:
        # segments holding tombstoned docs must be rewritten too
        docmap_all = idx.docmap()
        del_segs = sorted(
            int(r["segment"]) for r in docmap_all
            .join(deletes, "docid", "left_semi")
            .select("segment").distinct().collect())
        small = sorted(set(small) | set(del_segs))
    if len(small) <= 1 and deletes is None:
        return len(seg_sizes)
    if not small:
        return len(seg_sizes)

    stop = frozenset(m.get("stop_words", ()))
    builder = _segment_builder(dps, stop)
    docmap = idx.docmap()
    if "content" not in docmap.columns:
        raise ValueError(
            "compaction needs document content: this index's docmap is "
            "slim (batch build) — re-run build_segment_index with a "
            "larger docs_per_segment instead, or compact from the "
            "source corpus table")
    merged_src = docmap.where(F.col("segment").isin(small))
    applied_del_ids: list[int] = []
    if deletes is not None:
        applied_del_ids = [
            int(r["docid"]) for r in
            merged_src.join(deletes, "docid", "left_semi")
            .select("docid").collect()]
        merged_src = merged_src.join(deletes, "docid", "left_anti")
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
    out = analyzed_columns(
        w_ids, max_token_length=int(m["max_token_length"])
    ).drop("content").groupBy("segment").applyInPandas(builder, BLOCKS_SCHEMA)
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

    if applied_del_ids:
        # retire the tombstones that were physically applied; keep the
        # rest (docs living in surviving segments)
        remaining = sorted(
            set(int(d) for d in idx.deleted_docids()) - set(applied_del_ids))
        shutil.rmtree(idx.deletes_path)
        if remaining:
            append_deletes(idx.root, remaining)
        # deleted docs are gone from postings: refresh docs/dict/stats
        # + manifest counts (Lucene: merged segments lose deletions and
        # docCount drops to numDocs)
        IncrementalIndexer(idx.root)._refresh_derived(idx)
    return len({int(r["segment"]) for r in
                idx.blocks().select("segment").distinct().collect()})
