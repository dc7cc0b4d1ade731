"""Query AST shared by the oracle engine and the Spark engine.

Mirrors the Lucene query types of SURVEY.md §2.4 (TermQuery,
BooleanQuery with MUST/SHOULD/FILTER/MUST_NOT + minimumNumberShouldMatch,
BoostQuery, PhraseQuery, ConstantScoreQuery) as plain dataclasses.
Semantics references: search/TermQuery.java, search/BooleanQuery.java:78-222,
search/BoostQuery.java, search/PhraseQuery.java.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact/sloppy phrase. ``terms`` with parallel ``positions`` (allows
    stopword gaps, PhraseQuery.java builder); slop=0 → ExactPhraseMatcher
    semantics, slop>0 → SloppyPhraseMatcher."""

    terms: tuple[str, ...]
    positions: tuple[int, ...] | None = None
    slop: int = 0
    boost: float = 1.0
    field: str = "content"

    def effective_positions(self) -> tuple[int, ...]:
        return self.positions if self.positions is not None else tuple(range(len(self.terms)))


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with per-slot term alternatives
    (search/MultiPhraseQuery.java): each position slot matches ANY of
    its terms; the matcher walks the union of the slot terms' position
    lists; the weight sums idf over ALL member terms with df > 0
    (MultiPhraseWeight ctor → BM25Similarity.idfExplain(termStats[]))."""

    termss: tuple[tuple[str, ...], ...]
    positions: tuple[int, ...] | None = None
    slop: int = 0
    boost: float = 1.0
    field: str = "content"

    def effective_positions(self) -> tuple[int, ...]:
        return self.positions if self.positions is not None else tuple(range(len(self.termss)))


@dataclass(frozen=True)
class CommonTermsQuery(Query):
    """df-threshold split query (queries/CommonTermsQuery.java): terms
    whose df exceeds ``max_term_frequency`` (absolute when >= 1, else a
    fraction of docCount) are "common" and demoted to an optional
    scoring clause; rare terms form the required part. Rewrites against
    the dictionary via :func:`build_common_terms` — shared by the
    oracle and the Spark engine so both split identically."""

    terms: tuple[str, ...]
    max_term_frequency: float = 0.01
    low_freq_occur: str = "SHOULD"
    high_freq_occur: str = "SHOULD"
    low_freq_msm: int = 0
    high_freq_msm: int = 0
    boost: float = 1.0
    field: str = "content"


def build_common_terms(q: CommonTermsQuery, dfs: dict[str, int],
                       doc_count: int) -> Query:
    """CommonTermsQuery.buildQuery semantics: split by the df cutoff;
    low-freq-only or high-freq-only collapse to a single boolean;
    otherwise MUST(lowFreq) + SHOULD(highFreq). Fractional cutoffs are
    ceil'd: CommonTermsQuery.java:158 compares
    df > ceil(maxTermFrequency * maxDoc), so a term with df exactly at
    the ceiling is LOW-frequency."""
    import math

    cutoff = (q.max_term_frequency if q.max_term_frequency >= 1.0
              else math.ceil(q.max_term_frequency * doc_count))
    low = [t for t in q.terms if dfs.get(t, 0) <= cutoff]
    high = [t for t in q.terms if dfs.get(t, 0) > cutoff]
    low_q = BooleanQuery(
        tuple(BooleanClause(TermQuery(t, field=q.field), q.low_freq_occur)
              for t in low),
        q.low_freq_msm)
    high_q = BooleanQuery(
        tuple(BooleanClause(TermQuery(t, field=q.field), q.high_freq_occur)
              for t in high),
        q.high_freq_msm)
    if not high:
        return BooleanQuery(low_q.clauses, q.low_freq_msm, q.boost)
    if not low:
        return BooleanQuery(high_q.clauses, q.high_freq_msm, q.boost)
    return BooleanQuery(
        (BooleanClause(low_q, "MUST"), BooleanClause(high_q, "SHOULD")),
        0, q.boost)


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: str  # "MUST" | "SHOULD" | "FILTER" | "MUST_NOT"


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...]
    minimum_should_match: int = 0
    boost: float = 1.0

    @staticmethod
    def of(
        should: list[Query] = (),
        must: list[Query] = (),
        must_not: list[Query] = (),
        filter: list[Query] = (),
        minimum_should_match: int = 0,
    ) -> "BooleanQuery":
        cl = []
        cl += [BooleanClause(q, "MUST") for q in must]
        cl += [BooleanClause(q, "SHOULD") for q in should]
        cl += [BooleanClause(q, "FILTER") for q in filter]
        cl += [BooleanClause(q, "MUST_NOT") for q in must_not]
        return BooleanQuery(tuple(cl), minimum_should_match)


class MultiTermQuery(Query):
    """Base for term-set-expansion queries. ``rewrite`` mirrors
    MultiTermQuery.RewriteMethod (MultiTermQuery.java:68,94-126):
    "constant_score" (default) or "scoring_boolean"."""


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    prefix: str
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    """`*` any sequence, `?` one char, `\\` escapes
    (search/WildcardQuery.java:35-43)."""

    pattern: str
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """Full-term-anchored regex (search/RegexpQuery.java); we accept the
    Python `re` dialect subset shared with Lucene's automaton syntax."""

    pattern: str
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """Defaults per FuzzyQuery.java:55,60-78: maxEdits=2, prefixLength=0,
    transpositions=true (OSA distance)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    transpositions: bool = True
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    """Lexicographic term range (search/TermRangeQuery.java); None bound
    = open end."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class TermInSetQuery(MultiTermQuery):
    """Docs containing any of a term set (search/TermInSetQuery.java);
    always constant-score in Lucene."""

    terms: tuple[str, ...]
    rewrite: str = "constant_score"
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Scores member terms as one pseudo-term: freq = sum of member
    freqs per doc, df = max of member dfs, ttf = sum — one similarity
    call (SynonymQuery.java:144-158, freq sum at :446-455)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """Per-doc max of sub-scores + tieBreaker × sum of the others,
    accumulated in double, cast to float once
    (DisjunctionMaxScorer.java:58-71)."""

    disjuncts: tuple[Query, ...]
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    """Matches nothing (search/MatchNoDocsQuery.java) — the rewrite
    target for empty booleans / unsatisfiable queries."""

    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class FieldExistsQuery(Query):
    """Docs that have indexed the field (DocValuesFieldExistsQuery /
    NormsFieldExistsQuery role): constant score `boost`."""

    field: str
    boost: float = 1.0


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """BlendedTermQuery (search/BlendedTermQuery.java:48-296): blends
    the statistics of several terms (typically the same text across
    fields) so they score as if they were one term — df = max of the
    member dfs, ttf = sum (:275-283 adjustFrequencies) — then rewrites
    to a DisjunctionMax (tie 0.01, :183) or a SHOULD-Boolean (:133) of
    the stat-adjusted term leaves. ``terms`` is ((field, term, boost),
    ...)."""

    terms: tuple[tuple[str, str, float], ...]
    rewrite_method: str = "dismax"  # DISJUNCTION_MAX_REWRITE default
    tie_breaker: float = 0.01
    boost: float = 1.0


@dataclass(frozen=True)
class BlendedTermLeaf(Query):
    """A term leaf scoring with OVERRIDDEN collection stats (the
    adjusted TermStates of BlendedTermQuery.java:297-318). Produced by
    the searcher/oracle rewrite; not built directly by users."""

    field: str
    term: str
    df: int
    ttf: int
    boost: float = 1.0


@dataclass(frozen=True)
class CoveringQuery(Query):
    """Sandbox CoveringQuery (lucene/sandbox/.../search/CoveringQuery.java:36-63):
    a disjunction whose minimumNumberMatch is PER-DOCUMENT, read from a
    LongValuesSource. Values < 1 behave like 1; docs with NO value for
    the source do not match (CoveringScorer.java:125-134). Score = sum
    of the matching sub-queries' scores.

    ``min_match`` is a function-query expression over the docs table
    (the LongValuesSource role — e.g. ``"mod(dl, 4)"`` or a DocValues
    ``field(x)``); ``oracle_min_match`` optionally carries a
    docid -> int|None callable for the pure-Python oracle (excluded
    from equality/hash: it is test plumbing, not query identity)."""

    queries: tuple[Query, ...]
    min_match: str
    boost: float = 1.0
    oracle_min_match: object = field(
        default=None, compare=False, hash=False)


@dataclass(frozen=True)
class TopDoc:
    docid: int
    score: float  # float32 value

    def key(self):
        # HitQueue.java:76-81 — score desc, docID asc
        return (-self.score, self.docid)
