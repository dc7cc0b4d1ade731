"""FuzzyLikeThisQuery: fuzz a free-text query against the dictionary.

Reference: ``lucene/sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java`` — analyze each (queryString, field) pair; for
every distinct source term enumerate fuzzy variants from the term
dictionary (FuzzyTermsEnum semantics: transpositions=true, boost = 1.0
for an exact match else ``1 - ed / min(|variant|, |source|)`` in
codepoints, ``core/.../search/FuzzyTermsEnum.java:231-237``), keep the
top ``MAX_VARIANTS_PER_TERM`` = 50 per source term (:77, :205), rescore
each surviving variant as ``score² × ClassicSimilarity.idf(df,
numDocs)`` where df is the SOURCE term's df, or the integer-average of
all enumerated variants' dfs when the source is absent (:212, :232-246;
``ClassicSimilarity.java:61-63`` idf = ln((N+1)/(df+1)) + 1), keep the
global top ``maxNumTerms`` (:278-283), and rewrite to a disjunction of
per-source-term SHOULD groups whose member term queries carry the score
as boost and score against ARTIFICIAL collection stats df = ttf = 1
(newTermQuery, :256-273) — or constant-score when ``ignoreTF`` (:257).

Both engines share this builder (the repo's expand_terms convention):
the variant enumeration is injected, so the Spark searcher prunes its
dict scan (prefix + levenshtein prefilter) while the oracle walks its
in-memory vocabulary — identical expansion, identical query tree. The
artificial-stats member queries reuse ``BlendedTermLeaf`` (already the
"overridden TermStates" leaf of BlendedTermQuery).

Tie-breaking matches ScoreTermQueue.lessThan (equal scores: the
lexicographically smaller term wins a queue slot).
"""
from __future__ import annotations

import heapq
import math
from dataclasses import dataclass

import numpy as np

from .queries import (
    BlendedTermLeaf,
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    MatchNoDocsQuery,
    Query,
    TermQuery,
)

#: FuzzyLikeThisQuery.java:77
MAX_VARIANTS_PER_TERM = 50


@dataclass(frozen=True)
class FieldVals:
    """FuzzyLikeThisQuery.FieldVals (:115): one addTerms() call."""

    query_string: str
    field: str = "content"
    max_edits: int = 2
    prefix_length: int = 0


@dataclass(frozen=True)
class FuzzyLikeThisQuery(Query):
    """AST node; rewritten by the engines via :func:`build_fuzzy_like_this`."""

    field_vals: tuple[FieldVals, ...]
    max_num_terms: int = 25
    ignore_tf: bool = False
    boost: float = 1.0
    #: the reference constructor takes the Analyzer (:109-113); None →
    #: the engines default to StandardAnalyzer
    analyzer: object = None


def fuzzy_variant_score(source: str, variant: str, max_edits: int) -> float:
    """FuzzyTermsEnum boost: exact → 1.0; else 1 - ed/min lengths
    (FuzzyTermsEnum.java:231-237). ed = OSA (transpositions=true, as
    FuzzyLikeThisQuery passes transpositions=true at :212)."""
    if variant == source:
        return 1.0
    from ..search.multiterm import osa_distance

    ed = osa_distance(source, variant, cap=max_edits)
    if ed > max_edits:
        return float("-inf")
    return 1.0 - float(ed) / float(min(len(variant), len(source)))


class _ScoreTermQueue:
    """PriorityQueue<ScoreTerm> with ScoreTermQueue.lessThan: min by
    (score, then lexicographically LARGER term is less — so on a tie
    the smaller term survives). insertWithOverflow semantics."""

    def __init__(self, size: int):
        self.size = size
        self._heap: list[tuple[float, _RevStr, tuple]] = []

    def insert(self, score: float, term: str, payload: tuple) -> None:
        item = (score, _RevStr(term), payload)
        if len(self._heap) < self.size:
            heapq.heappush(self._heap, item)
        elif self._heap and item > self._heap[0]:
            heapq.heapreplace(self._heap, item)

    def items(self) -> list[tuple[float, str, tuple]]:
        """Ascending queue order (pop order of the reference loop)."""
        out = []
        h = list(self._heap)
        while h:
            score, rs, payload = heapq.heappop(h)
            out.append((score, rs.s, payload))
        return out


class _RevStr:
    """Reverse-ordered string for heap tie-breaks."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other):  # larger string = "less than"
        return self.s > other.s

    def __gt__(self, other):
        return self.s < other.s

    def __eq__(self, other):
        return self.s == other.s


def classic_idf(df: int, doc_count: int) -> float:
    """ClassicSimilarity.idf (:61-63), float32."""
    return float(np.float32(math.log((doc_count + 1) / float(df + 1))
                            + 1.0))


def build_fuzzy_like_this(
    q: FuzzyLikeThisQuery,
    enumerate_variants,  # (field, term, max_edits, prefix_length)
    #                      -> list[(variant_term, df)]
    doc_freq,            # (field, term) -> int
    doc_count: int,
    analyzer,
) -> Query:
    """The rewrite (FuzzyLikeThisQuery.rewrite, :276-333): returns a
    BooleanQuery of per-source-term SHOULD groups of artificial-stats
    term queries, each boosted by its global-queue score."""
    global_q = _ScoreTermQueue(q.max_num_terms)
    for fv in q.field_vals:
        if not fv.query_string:
            continue
        seen: set[str] = set()
        terms, _pos = analyzer.analyze(fv.query_string)
        for term in terms:
            if term in seen:
                continue
            seen.add(term)
            candidates = enumerate_variants(
                fv.field, term, fv.max_edits, fv.prefix_length)
            # exact refinement: the enumerator may prefilter loosely
            # (the Spark dict scan); numVariants/totalVariantDocFreqs
            # count the TRUE automaton matches (:215-222)
            exact = []
            for vterm, vdf in candidates:
                score = fuzzy_variant_score(term, vterm, fv.max_edits)
                if score != float("-inf"):
                    exact.append((vterm, int(vdf), score))
            if not exact:
                continue
            vq = _ScoreTermQueue(MAX_VARIANTS_PER_TERM)
            total_df = 0
            for vterm, vdf, score in exact:
                total_df += vdf
                vq.insert(score, vterm, (vdf,))
            kept = vq.items()
            # df for idf: the source term's own df, else the integer
            # average of all enumerated variants' dfs (:232-237)
            df = doc_freq(fv.field, term)
            if df == 0:
                df = total_df // len(exact)
            idf = classic_idf(df, doc_count)
            for score, vterm, _payload in kept:
                # float32: (score * score) * idf  (:244)
                final = float(np.float32(
                    np.float32(score) * np.float32(score)) * np.float32(idf))
                global_q.insert(final, vterm, (term, fv.field))
    # group surviving variants by their fuzzied source term (:289-301)
    groups: dict[tuple[str, str], list[tuple[str, float]]] = {}
    for score, vterm, (src, fld) in global_q.items():
        groups.setdefault((fld, src), []).append((vterm, score))
    if not groups:
        return MatchNoDocsQuery()
    outer = []
    for (fld, _src), members in groups.items():
        leaves = tuple(
            BooleanClause(_member_query(fld, vterm, score, q.ignore_tf),
                          "SHOULD")
            for vterm, score in members)
        if len(leaves) == 1:
            outer.append(leaves[0])
        else:
            outer.append(BooleanClause(BooleanQuery(leaves), "SHOULD"))
    return BooleanQuery(tuple(outer), boost=q.boost)


def _member_query(field: str, term: str, score: float,
                  ignore_tf: bool) -> Query:
    """newTermQuery (:256-273): ConstantScore when ignoreTF, else a
    term query over artificial df = ttf = 1 stats, boosted by score."""
    if ignore_tf:
        return ConstantScoreQuery(TermQuery(term, field=field),
                                  boost=score)
    return BlendedTermLeaf(field, term, 1, 1, boost=score)
