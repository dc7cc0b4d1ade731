"""Distributed (sharded) search with pluggable stats caches.

Reference: Solr distributed search (handler/component/QueryComponent's
shard fan-out + merge) and the distributed-IDF stats caches in
``solr/core/src/java/org/apache/solr/search/stats/``:

* ``LocalStatsCache.java`` — Solr's DEFAULT: every shard scores with
  its OWN term/collection statistics; ranks can diverge from a
  monolithic index when shards are statistically skewed.
* ``ExactStatsCache.java`` — one extra stats round-trip: per-term
  docFreq and the collection counts are aggregated across shards
  (``mergeToGlobalStats`` / ``returnLocalStats``), and every shard
  scores with the GLOBAL weights — results are rank- and score-
  identical to one big index.

Merge follows ``TopDocs.merge`` (lucene/search/TopDocs.java:105-117,
188-230): score desc, then shard index, then per-shard doc id. With
shards produced by :func:`..index.segments.split_index` (contiguous
docid slices, shard order = slice order), the (shard, local-docid)
tie-break is EXACTLY the monolithic docid tie-break, which is what
makes the exact-stats mode bit-identical end-to-end.

Scale shape: the stats round is one tiny dictionary lookup per shard
(bucket-pruned scan or driver cache hit); each shard query is the
normal one-job compressed-path search; the merge touches k rows per
shard on the driver. Shards never talk to each other — the same
topology as SolrCloud's scatter-gather.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..index.segments import SegmentIndex
from . import bm25
from .queries import Query, TopDoc
from .wand import SegmentSearcher


class ShardedSearcher:
    """Scatter-gather searcher over independent shard indexes.

    ``stats="exact"`` (ExactStatsCache) or ``"local"``
    (LocalStatsCache). Global docids = shard offset + local docid,
    offsets defaulting to the cumulative doc counts (the
    split_index / addIndexes numbering).
    """

    def __init__(self, roots: list[str], spark: SparkSession,
                 stats: str = "exact", cache: bool = False):
        if stats not in ("exact", "local"):
            raise ValueError(f"unknown stats cache {stats!r}")
        self.stats_mode = stats
        self.shards = [SegmentSearcher(SegmentIndex(r, spark), cache=cache)
                       for r in roots]
        self.offsets = []
        off = 0
        for s in self.shards:
            self.offsets.append(off)
            off += s.doc_count
        self.doc_count = off
        self.sum_ttf = sum(s.sum_ttf for s in self.shards)
        if stats == "exact":
            # collection-level stats merge (ExactStatsCache.java:
            # mergeToGlobalStats role), PER FIELD — every shard scores
            # every field with global docCount/avgdl; per-term dfs
            # resolve per query
            fields: set[str] = set()
            for s in self.shards:
                fields |= set(s.field_stats)
            for f in sorted(fields):
                dc = sum(int(s.field_stats.get(f, {}).get("doc_count", 0))
                         for s in self.shards)
                ttf = sum(int(s.field_stats.get(f, {}).get("sum_ttf", 0))
                          for s in self.shards)
                scorer = bm25.BM25Scorer(max(dc, 1), max(ttf, 1))
                for s in self.shards:
                    s.set_scorer(scorer, field=f)

    def _query_terms(self, q: Query) -> set[str]:
        """FIELD-QUALIFIED terms of ``q`` (the _qual rendering
        SegmentSearcher keys stats/blocks by — a bare-term key would
        silently resolve df=0 for any non-content field), unioned over
        each shard's rewrite so multi-term expansions contribute their
        per-shard expansions to the stats round."""
        out: set[str] = set()
        for s in self.shards:
            out |= SegmentSearcher._general_terms(s.rewrite(q))
        return out

    def _global_dfs(self, q: Query) -> dict[str, int]:
        """Per-term global docFreq = Σ shard docFreq (the stats
        round-trip; ExactStatsCache.returnLocalStats → merge)."""
        terms = self._query_terms(q)
        out: dict[str, int] = {}
        for s in self.shards:
            for t, df in s._stats(terms).items():
                out[t] = out.get(t, 0) + df
        return out

    def search_many(self, queries: dict[str, Query], k: int = 10,
                    use_wand: bool = True) -> dict[str, list[TopDoc]]:
        """Batched scatter-gather: ONE batched job per shard (the
        shard-side tree-batch leaf amortizes decodes across the whole
        batch), exact-stats mode resolves the batch's full term set in
        one global round, merge per query with the TopDocs.merge
        comparator."""
        stats = None
        if self.stats_mode == "exact":
            term_set: set[str] = set()
            for q in queries.values():
                term_set |= self._query_terms(q)
            stats = {}
            for s in self.shards:
                for t, df in s._stats(term_set).items():
                    stats[t] = stats.get(t, 0) + df
        qid_list = list(queries)
        per_shard: list[dict[str, list[TopDoc]]] = []
        for s in self.shards:
            # global stats thread through the searcher's stats
            # override (like search_df's) — never by mutating the
            # shared _df_map, which is both non-reentrant and the
            # multi-term rewrite dictionary
            res = s.search_many(queries, k, use_wand=use_wand,
                                stats=stats)
            per_shard.append(res)
        out: dict[str, list[TopDoc]] = {}
        for qid in qid_list:
            merged = sorted(
                ((d.score, si, d.docid)
                 for si, res in enumerate(per_shard)
                 for d in res.get(qid, ())),
                key=lambda t: (-t[0], t[1], t[2]))[:k]
            out[qid] = [TopDoc(self.offsets[si] + docid, score)
                        for score, si, docid in merged]
        return out

    def search(self, q: Query, k: int = 10,
               use_wand: bool = True) -> list[TopDoc]:
        stats = self._global_dfs(q) if self.stats_mode == "exact" else None
        per_shard: list[list[TopDoc]] = []
        for s in self.shards:
            rows = s.search_df(q, k, use_wand=use_wand,
                               stats=stats).collect()
            per_shard.append([TopDoc(r["docid"], r["score"]) for r in rows])
        # TopDocs.merge comparator: score desc, shard index asc,
        # local docid asc — then remap to global ids
        merged = sorted(
            ((d.score, si, d.docid) for si, docs in enumerate(per_shard)
             for d in docs),
            key=lambda t: (-t[0], t[1], t[2]))[:k]
        return [TopDoc(self.offsets[si] + docid, score)
                for score, si, docid in merged]


