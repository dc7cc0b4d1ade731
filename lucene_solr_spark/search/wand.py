"""Block-max WAND top-k over the compressed segment index (codec v2).

Spark rendering of Lucene's dynamic-pruning read path (SURVEY §4.2):

  * leaves = segments (contiguous docID ranges). The query scans ONLY
    the block rows of the query's terms (Parquet predicate pushdown on
    `term` + column pruning keep the scan proportional to the query,
    not the index), shuffles that small set by segment, and runs one
    Arrow-batched ``applyInPandas`` per segment = Lucene's per-leaf
    ``BulkScorer`` (search/IndexSearcher.java:634-656).
  * inside a leaf, candidate windows advance block-at-a-time; a window
    is skipped without decoding when the sum of the overlapping blocks'
    max scores is below the current k-th score — the role of
    WANDScorer + ImpactsDISI + MaxScoreCache
    (search/WANDScorer.java:228-299, search/ImpactsDISI.java:36-90,
    search/MaxScoreCache.java:61-105). Block max scores come from the
    stored competitive impacts and are computed with the *same* float32
    arithmetic as scoring, so the bound is exact (tight ≥, never <).
  * pruning is an optimization, not a semantics change: results are
    rank- and score-identical to exhaustive evaluation (A/B enforced in
    tests — the oracle SURVEY §4.2 calls for). The skip test is strict
    (`ub < θ`); docs scoring exactly θ are still evaluated and then
    lose the (score desc, docid asc) tie-break (HitQueue.java:76-81)
    because windows advance in docID order.
  * per-leaf top-k arrays then one global
    ``orderBy(score desc, docid asc).limit(k)`` = TopDocs.merge
    (TopDocs.java:188-230).

Scoring float discipline: per-term float32 scores, per-doc sums
accumulated in float64 and cast to float32 once (WANDScorer.java:445-453)
— implemented with ``np.bincount(…, weights=float64)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..index import codec
from ..index.segments import SegmentIndex
from . import bm25
from .executor import _str_in
from .queries import BooleanQuery, Query, TermQuery, TopDoc


class _TermBlocks:
    """Decoded block metadata for one term within one segment.

    Weight-free: upper bounds and decoded scores are the unit
    tf-partials (weight 1); a query's float32 weight multiplies in
    afterwards. Exactness is preserved because float32 multiplication
    by a positive weight is monotone, so max(w*x) == w*max(x) in
    float32 — the block bound stays the same value WANDScorer computes
    — and BM25Scorer.partial's discipline is weight * float32(tf_part)
    in float32 either way. This makes one decode shareable across a
    whole query batch (the batched WAND path)."""

    __slots__ = ("first", "last", "n", "dbufs", "tbufs", "nbufs",
                 "ub_unit", "nblocks")

    def __init__(self, rows: pd.DataFrame, cache: np.ndarray):
        rows = rows.sort_values("block_ord")
        self.first = rows["first_docid"].to_numpy(dtype=np.int64)
        self.last = rows["last_docid"].to_numpy(dtype=np.int64)
        self.n = rows["n"].to_numpy(dtype=np.int64)
        self.dbufs = rows["docids"].tolist()
        self.tbufs = rows["tfs"].tolist()
        self.nbufs = rows["norms"].tolist()
        self.nblocks = len(rows)
        ubs = np.empty(self.nblocks, dtype=np.float32)
        one = np.float32(1.0)
        imp_tfs = rows["imp_tfs"].tolist()
        imp_norms = rows["imp_norms"].tolist()
        for i in range(self.nblocks):
            # impact buffers carry the standard sequence header byte
            tfs = codec.decode_seq(imp_tfs[i], 0).astype(np.int64)
            nbs = codec.decode_seq(imp_norms[i], 0).astype(np.int64)
            s = bm25.score_terms(tfs, nbs, one, cache)
            ubs[i] = s.max() if s.size else 0.0
        self.ub_unit = ubs

    def decode(self, i: int, cache: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(docids, per-doc float32 UNIT scores) of block i."""
        n = int(self.n[i])
        docids = codec.decode_docids(int(self.first[i]), self.dbufs[i], n)
        tfs = codec.decode_seq(self.tbufs[i], n).astype(np.int64)
        norms = np.frombuffer(self.nbufs[i], dtype=np.uint8).astype(np.int64)
        scores = bm25.score_terms(tfs, norms, np.float32(1.0), cache)
        return docids, scores


def segment_topk(
    seg_blocks,
    weights: dict[str, float],
    cache: np.ndarray,
    k: int,
    min_should_match: int = 0,
    use_wand: bool = True,
    deleted: np.ndarray | None = None,
    tb_cache: dict | None = None,
    dec_cache: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k (docids, float32 scores) for a scored disjunction
    over one segment's block rows. Returns arrays sorted by
    (score desc, docid asc), length ≤ k.

    seg_blocks: the segment's block rows (DataFrame), or a prebuilt
    {term: rows} mapping. tb_cache/dec_cache (optional, per segment)
    share _TermBlocks construction and block decodes across the
    queries of one batch; without dec_cache, decoded blocks are
    dropped as the traversal passes them (bounded memory)."""
    if isinstance(seg_blocks, dict):
        groups = seg_blocks
    else:
        groups = {t: r for t, r in seg_blocks.groupby("term", sort=False)}
    terms: list[_TermBlocks] = []
    wts: list[np.float32] = []
    for term, w in weights.items():
        if not w:
            continue
        tb = tb_cache.get(term) if tb_cache is not None else None
        if tb is None:
            rows = groups.get(term)
            if rows is None or not len(rows):
                continue
            tb = _TermBlocks(rows, cache)
            if tb_cache is not None:
                tb_cache[term] = tb
        terms.append(tb)
        wts.append(np.float32(w))
    if not terms:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float32)

    T = len(terms)
    ptr = [0] * T
    decoded = dec_cache if dec_cache is not None else {}
    local_dec = dec_cache is None

    top_d = np.zeros(0, dtype=np.int64)
    top_s = np.zeros(0, dtype=np.float32)
    theta = None  # k-th best float32 score once the heap is full
    cursor = -1  # every docid <= cursor has been evaluated or pruned

    while True:
        active = [t for t in range(T) if ptr[t] < terms[t].nblocks]
        if not active:
            break
        boundary = min(int(terms[t].last[ptr[t]]) for t in active)
        overlap = [t for t in active if int(terms[t].first[ptr[t]]) <= boundary]

        skip = False
        if use_wand and theta is not None and min_should_match <= 1:
            ub_sum = float(np.sum(np.asarray(
                [np.float32(wts[t] * terms[t].ub_unit[ptr[t]])
                 for t in overlap], dtype=np.float64)))
            skip = ub_sum < float(theta)

        if not skip and overlap:
            all_d: list[np.ndarray] = []
            all_s: list[np.ndarray] = []
            for t in overlap:
                key = (id(terms[t]), ptr[t])
                if key not in decoded:
                    decoded[key] = terms[t].decode(ptr[t], cache)
                d, u = decoded[key]
                m = (d > cursor) & (d <= boundary)
                all_d.append(d[m])
                all_s.append((wts[t] * u[m]).astype(np.float32))
            d_cat = np.concatenate(all_d)
            s_cat = np.concatenate(all_s)
            if deleted is not None and deleted.size and d_cat.size:
                live = ~np.isin(d_cat, deleted)  # liveDocs mask (.liv role)
                d_cat, s_cat = d_cat[live], s_cat[live]
            if d_cat.size:
                uds, inv = np.unique(d_cat, return_inverse=True)
                sums = np.bincount(inv, weights=s_cat.astype(np.float64))
                scores = sums.astype(np.float32)
                if min_should_match > 1:
                    hits = np.bincount(inv)
                    keep = hits >= min_should_match
                    uds, scores = uds[keep], scores[keep]
                if uds.size:
                    cd = np.concatenate([top_d, uds])
                    cs = np.concatenate([top_s, scores])
                    order = np.lexsort((cd, -cs.astype(np.float64)))[:k]
                    top_d, top_s = cd[order], cs[order]
                    if top_d.size == k:
                        theta = top_s[-1]

        # advance every current block fully covered by this window
        cursor = boundary
        for t in active:
            if int(terms[t].last[ptr[t]]) <= boundary:
                if local_dec:
                    decoded.pop((id(terms[t]), ptr[t]), None)
                ptr[t] += 1

    return top_d, top_s


class SegmentSearcher:
    """IndexSearcher over the compressed segment index; flagship
    BM25 top-k path with block-max WAND."""

    def __init__(self, index: SegmentIndex, cache: bool = False):
        self.index = index
        m = index.manifest()
        self.doc_count = int(m["doc_count"])
        self.sum_ttf = int(m["sum_ttf"])
        self.scorer = bm25.BM25Scorer(self.doc_count, self.sum_ttf)
        self.blocks = index.blocks()
        self.dict = index.dict()
        # tombstones, masked inside each leaf BEFORE its top-k cut
        # (masking after the per-segment truncation would drop docs
        # that should be promoted); collection stats keep counting
        # deleted docs until compaction, exactly like Lucene's
        # docCount-vs-liveDocs split
        self.deleted = index.deleted_docids()
        self._df_map: dict[str, int] | None = None
        if cache:
            self.blocks.persist()
            self.blocks.count()
            pdf = self.dict.select("term", "df").toPandas()
            self._df_map = dict(zip(pdf["term"], pdf["df"].astype(int)))

    # -- planning -------------------------------------------------------
    def _stats(self, terms: set[str]) -> dict[str, int]:
        if not terms:
            return {}
        if self._df_map is not None:
            return {t: self._df_map[t] for t in terms if t in self._df_map}
        rows = self.dict.where(_str_in("term", terms)).collect()
        return {r["term"]: int(r["df"]) for r in rows}

    @staticmethod
    def _flatten(q: Query) -> tuple[list[tuple[str, float]], int]:
        """(term, boost) clauses + msm for term/SHOULD-boolean queries."""
        if isinstance(q, TermQuery):
            return [(q.term, q.boost)], 0
        if isinstance(q, BooleanQuery):
            out = []
            for c in q.clauses:
                if c.occur != "SHOULD" or not isinstance(c.query, TermQuery):
                    raise TypeError(
                        "SegmentSearcher supports term disjunctions "
                        "(SHOULD-only boolean over terms); use IndexSearcher "
                        "for the general boolean algebra"
                    )
                out.append((c.query.term, c.query.boost * q.boost))
            return out, q.minimum_should_match
        raise TypeError(f"unsupported query {type(q)}")

    # -- execution ------------------------------------------------------
    def search_df(self, q: Query, k: int = 10, use_wand: bool = True) -> DataFrame:
        clauses, msm = self._flatten(q)
        stats = self._stats({t for t, _ in clauses})
        weights = {
            t: float(self.scorer.weight(stats[t], b))
            for t, b in clauses if stats.get(t)
        }
        spark = self.index.spark
        if not weights:
            return spark.createDataFrame([], "docid long, score float")
        cache = self.scorer.cache
        need = max(msm, 1) if msm else 0

        deleted = self.deleted if self.deleted.size else None

        def leaf(pdf: pd.DataFrame) -> pd.DataFrame:
            d, s = segment_topk(pdf, weights, cache, k,
                                min_should_match=need, use_wand=use_wand,
                                deleted=deleted)
            return pd.DataFrame({"docid": d.astype(np.int64),
                                 "score": s.astype(np.float32)})

        filtered = self.blocks.where(
            _str_in("term", list(weights))
        ).select("segment", "term", "block_ord", "n", "first_docid",
                 "last_docid", "docids", "tfs", "norms", "imp_tfs", "imp_norms")
        per_seg = filtered.groupBy("segment").applyInPandas(
            leaf, "docid long, score float"
        )
        return per_seg.orderBy(F.desc("score"), F.asc("docid")).limit(k)

    def search(self, q: Query, k: int = 10, use_wand: bool = True) -> list[TopDoc]:
        rows = self.search_df(q, k, use_wand=use_wand).collect()
        return [TopDoc(r["docid"], r["score"]) for r in rows]

    # -- batched execution ---------------------------------------------
    def search_many_df(self, queries: dict[str, Query], k: int = 10,
                       use_wand: bool = True, _raw: bool = False) -> DataFrame:
        """Evaluate MANY queries in ONE job over the compressed index —
        the flagship throughput path (north-star workload: block-max
        WAND BM25 top-k over compressed postings).

        Execution shape: one bucket/term-pruned scan of the block
        rows for the batch's whole term set, one shuffle of those
        (compressed — a few bytes per posting) rows by segment, then
        per segment ONE applyInPandas task runs every query's WAND
        traversal back-to-back, sharing _TermBlocks metadata and block
        decodes across queries (decode-once-per-term). Per-leaf top-k
        arrays then a global per-query window merge (TopDocs.merge,
        TopDocs.java:188-230) of <= segments * |queries| * k rows.

        Scaling: task = (segment x whole batch) — minutes of pure
        numpy decode/score CPU per task at real batch sizes, no big
        shuffle, no driver loop; parallelism = segment count, which
        the builder sizes to O(corpus / docs_per_segment) independent
        of executor count."""
        spark = self.index.spark
        qid_list = list(queries)
        flat = {qid: self._flatten(q) for qid, q in queries.items()}
        term_set = {t for clauses, _ in flat.values() for t, _ in clauses}
        stats = self._stats(term_set)
        plans: list[tuple[dict[str, float], int]] = []
        for qid in qid_list:
            clauses, msm = flat[qid]
            w = {t: float(self.scorer.weight(stats[t], b))
                 for t, b in clauses if stats.get(t)}
            plans.append((w, max(msm, 1) if msm else 0))
        terms_present = sorted({t for w, _ in plans for t in w})
        if not terms_present:
            return spark.createDataFrame(
                [], ("qidx int" if _raw else "qid string")
                    + ", docid long, score float, rn int")
        cache = self.scorer.cache
        deleted = self.deleted if self.deleted.size else None
        kk = int(k)

        def leaf(pdf: pd.DataFrame) -> pd.DataFrame:
            from lucene_solr_spark.util.env import retain_malloc

            retain_malloc()
            groups = {t: r for t, r in pdf.groupby("term", sort=False)}
            tb_cache: dict = {}
            dec_cache: dict = {}
            out_q, out_d, out_s = [], [], []
            for qi, (w, need) in enumerate(plans):
                if not w:
                    continue
                d, s = segment_topk(
                    groups, w, cache, kk, min_should_match=need,
                    use_wand=use_wand, deleted=deleted,
                    tb_cache=tb_cache, dec_cache=dec_cache)
                if d.size:
                    out_q.append(np.full(d.size, qi, dtype=np.int32))
                    out_d.append(d)
                    out_s.append(s)
            if not out_q:
                return pd.DataFrame({
                    "qidx": pd.Series([], dtype="int32"),
                    "docid": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float32")})
            return pd.DataFrame({
                "qidx": np.concatenate(out_q),
                "docid": np.concatenate(out_d),
                "score": pd.Series(np.concatenate(out_s), dtype="float32")})

        filtered = self.blocks.where(
            _str_in("term", terms_present)
        ).select("segment", "term", "block_ord", "n", "first_docid",
                 "last_docid", "docids", "tfs", "norms", "imp_tfs",
                 "imp_norms")
        per_seg = filtered.groupBy("segment").applyInPandas(
            leaf, "qidx int, docid long, score float")
        from pyspark.sql.window import Window

        win = Window.partitionBy("qidx").orderBy(
            F.desc("score"), F.asc("docid"))
        topk = (per_seg.select(
            "qidx", "docid", "score", F.row_number().over(win).alias("rn"))
            .where(F.col("rn") <= kk))
        if _raw:
            return topk
        qmap_df = spark.createDataFrame(pd.DataFrame(
            {"qidx": pd.array(range(len(qid_list)), dtype="int32"),
             "qid": qid_list}))
        return (topk.join(F.broadcast(qmap_df), "qidx")
                .select("qid", "docid", "score", "rn"))

    def search_many(self, queries: dict[str, Query], k: int = 10,
                    use_wand: bool = True) -> dict[str, list[TopDoc]]:
        rows = self.search_many_df(queries, k, use_wand=use_wand,
                                   _raw=True).collect()
        qid_list = list(queries)
        out: dict[str, list[TopDoc]] = {qid: [] for qid in queries}
        for r in sorted(rows, key=lambda r: (r["qidx"], r["rn"])):
            out[qid_list[r["qidx"]]].append(TopDoc(r["docid"], r["score"]))
        return out
