"""IR-quality benchmark harness: judged retrieval runs → MAP / P@N /
recall / MRR.

Reference: ``lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/`` — ``QualityStats.java`` (the metric accumulator:
precision-at-N for N ≤ MAX_POINTS=20 with the partial-list extension
rule, average precision at recall points, recall, MRR counted only
when the first relevant doc lands in the top 5, and the
good-queries-only ``average``), ``QualityBenchmark.java:88-112``
(execute: parse → search → judge each ranked result in order),
``trec/TrecJudge.java:52-81`` (qrels parsing: ``qnum 0 doc-name
is-relevant``, only relevant lines retained) and ``QualityQuery.java``.

Spark-first twist: the reference extracts each hit's doc name with a
stored-fields lookup per result (``DocNameExtractor``); here the
engine's top-k already returns docids, and ``execute`` resolves ALL
queries' result names with ONE broadcast join against the docs table
instead of k×|queries| point lookups.

The synthetic topic/qrel generator (:func:`make_topics`) replaces the
TREC topic feeds (``benchmark/quality/trec/TrecTopicsReader.java``):
topics are deterministic term pairs drawn from the corpus dictionary,
and the ground truth is exact boolean containment (a doc is relevant
iff it matches ALL topic terms) — an oracle an independent SQL engine
can replicate, in the spirit of the reference's TREC qrels.
"""
from __future__ import annotations

from dataclasses import dataclass, field

MAX_POINTS = 20  # QualityStats.MAX_POINTS


@dataclass
class QualityQuery:
    """QualityQuery.java: an ID plus the raw topic text."""

    query_id: str
    text: str


class QualityStats:
    """Port of QualityStats.java's accumulator semantics."""

    def __init__(self, max_good_points: float, search_time: float = 0.0):
        self.max_good_points = float(max_good_points)
        self.search_time = float(search_time)
        self.recall_points: list[tuple[int, float]] = []
        self.p_at = [0.0] * (MAX_POINTS + 1)  # p_at[0] unused
        self.p_relevant_sum = 0.0
        self.num_points = 0.0
        self.num_good_points = 0.0
        self.mrr = 0.0
        self.recall = 0.0

    def add_result(self, n: int, is_relevant: bool) -> None:
        # ranks must arrive consecutively (QualityStats.java:86-88)
        if abs(self.num_points + 1 - n) > 1e-6:
            raise ValueError(f"point {n} illegal after "
                             f"{self.num_points} points!")
        if is_relevant:
            self.num_good_points += 1
            self.recall_points.append((n, self.num_good_points))
            # MRR counts only a first hit within the top 5 (:91-93)
            if len(self.recall_points) == 1 and n <= 5:
                self.mrr = 1.0 / n
        self.num_points = float(n)
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if n < len(self.p_at):
            self.p_at[n] = p
        self.recall = (p if self.max_good_points <= 0
                       else self.num_good_points / self.max_good_points)

    def precision_at(self, n: int) -> float:
        """P@n with the reference's short-result extension: past the
        end of the ranked list, precision decays as if every further
        rank were non-relevant (QualityStats.java:113-118)."""
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"n={n} - must be in [1,{MAX_POINTS}]")
        if n > self.num_points:
            return (self.num_points * self.p_at[int(self.num_points)]) / n
        return self.p_at[n]

    def avp(self) -> float:
        """Average precision at recall points (:120-123)."""
        return (0.0 if self.max_good_points == 0
                else self.p_relevant_sum / self.max_good_points)

    @staticmethod
    def average(stats: list["QualityStats"]) -> "QualityStats":
        """QualityStats.average (:195-233): times average over ALL
        queries; every other measure averages over queries with
        positive judgements only. The averaged ``avp()`` is MAP."""
        avg = QualityStats(0.0, 0.0)
        if not stats:
            return avg
        m = 0
        for s in stats:
            avg.search_time += s.search_time
            if s.max_good_points > 0:
                m += 1
                avg.num_good_points += s.num_good_points
                avg.num_points += s.num_points
                avg.p_relevant_sum += s.avp()
                avg.recall += s.recall
                avg.mrr += s.mrr
                avg.max_good_points += s.max_good_points
                for j in range(1, len(avg.p_at)):
                    avg.p_at[j] += s.precision_at(j)
        if m == 0:
            raise ValueError('no "good" queries!')
        avg.search_time /= len(stats)
        avg.num_good_points /= m
        avg.num_points /= m
        avg.recall /= m
        avg.mrr /= m
        avg.max_good_points /= m
        for j in range(1, len(avg.p_at)):
            avg.p_at[j] /= m
        avg.p_relevant_sum /= m
        avg.p_relevant_sum *= avg.max_good_points  # so avp() == MAP
        return avg


class TrecJudge:
    """trec/TrecJudge.java: qrels in ``qnum 0 doc-name is-relevant``
    format; blank lines and '#' comments skipped; only relevant docs
    retained (:52-81)."""

    def __init__(self, qrels_text: str):
        self.judgements: dict[str, set[str]] = {}
        for line in qrels_text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) != 4:
                raise ValueError(f"wrong format: {line}")
            qid, _zero, doc_name, rel = parts
            if rel != "0":
                self.judgements.setdefault(qid, set()).add(doc_name)

    def is_relevant(self, doc_name: str, query: QualityQuery) -> bool:
        return doc_name in self.judgements.get(query.query_id, ())

    def max_recall(self, query: QualityQuery) -> int:
        return len(self.judgements.get(query.query_id, ()))

    def validate_data(self, queries: list[QualityQuery]) -> bool:
        """Judge.validateData role: every query judged and vice versa."""
        qids = {q.query_id for q in queries}
        return qids == set(self.judgements)


@dataclass
class QualityBenchmark:
    """QualityBenchmark.java: run judged queries against the engine.

    ``parser(QualityQuery) -> Query`` is the QualityQueryParser role.
    ``doc_name_cols`` names the docs-table columns whose '/'-join is
    the stable document name (TREC docno role) — docids are
    layout-dependent, names are not.
    """

    searcher: object  # IndexSearcher
    parser: object    # Callable[[QualityQuery], Query]
    doc_name_cols: tuple = ("repo", "path", "commit")
    max_results: int = 1000

    def execute(self, queries: list[QualityQuery], judge: TrecJudge,
                ) -> list[QualityStats]:
        import time

        from pyspark.sql import functions as F

        # search every topic; keep ranked docids
        ranked: dict[str, list[int]] = {}
        times: dict[str, float] = {}
        for qq in queries:
            t0 = time.perf_counter()
            top = self.searcher.search(self.parser(qq), self.max_results)
            times[qq.query_id] = time.perf_counter() - t0
            ranked[qq.query_id] = [d.docid for d in top]
        # ONE name-resolution join for all results (DocNameExtractor
        # role, batched: the result set is k×|queries|, tiny vs corpus)
        all_ids = sorted({d for ds in ranked.values() for d in ds})
        name_expr = F.concat_ws("/", *[F.col(c) for c in
                                       self.doc_name_cols])
        rows = (self.searcher.docs
                .where(F.col("docid").isin(all_ids))
                .select("docid", name_expr.alias("name")).collect()
                ) if all_ids else []
        names = {r["docid"]: r["name"] for r in rows}
        out = []
        for qq in queries:
            st = QualityStats(judge.max_recall(qq),
                              search_time=times[qq.query_id])
            for i, docid in enumerate(ranked[qq.query_id]):
                st.add_result(i + 1, judge.is_relevant(
                    names[docid], qq))
            out.append(st)
        return out


def make_topics(searcher, n_topics: int = 10, terms_per_topic: int = 2,
                doc_name_cols: tuple = ("repo", "path", "commit"),
                min_df: int = 3):
    """Deterministic synthetic topics + TREC-format qrels over the
    indexed corpus (the TrecTopicsReader/qrels role, generated instead
    of read): topic i = the i-th pair of mid-df dictionary terms;
    ground truth = docs containing ALL the topic's terms (exact
    boolean containment — independently checkable). Returns
    ``(queries, qrels_text)``."""
    from pyspark.sql import functions as F

    dct = (searcher.dict
           .where(F.col("df") >= min_df)
           .orderBy(F.col("df").desc(), F.col("term"))
           .select("term").limit(n_topics * terms_per_topic * 2)
           .collect())
    terms = [r["term"] for r in dct]
    queries: list[QualityQuery] = []
    lines: list[str] = []
    name_expr = F.concat_ws("/", *[F.col(c) for c in doc_name_cols])
    for i in range(n_topics):
        topic = terms[i * terms_per_topic:(i + 1) * terms_per_topic]
        if len(topic) < terms_per_topic:
            break
        qid = f"T{i}"
        queries.append(QualityQuery(qid, " ".join(topic)))
        # relevant = contains ALL terms: chain of semi-joins on the
        # postings table (docid-keyed; the AND ground truth)
        rel = None
        for t in topic:
            side = (searcher.postings
                    .where(F.col("term") == t).select("docid").distinct())
            rel = side if rel is None else rel.join(side, "docid",
                                                    "left_semi")
        rel_names = (searcher.docs.join(rel, "docid", "left_semi")
                     .select(name_expr.alias("name"))
                     .orderBy("name").collect())
        for r in rel_names:
            lines.append(f"{qid} 0 {r['name']} 1")
    return queries, "\n".join(lines)
