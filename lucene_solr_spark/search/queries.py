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


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact/sloppy phrase. ``terms`` with parallel ``positions`` (allows
    stopword gaps, PhraseQuery.java builder); slop=0 → ExactPhraseMatcher
    semantics, slop>0 → SloppyPhraseMatcher."""

    terms: tuple[str, ...]
    positions: tuple[int, ...] | None = None
    slop: int = 0
    boost: float = 1.0

    def effective_positions(self) -> tuple[int, ...]:
        return self.positions if self.positions is not None else tuple(range(len(self.terms)))


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


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class TopDoc:
    docid: int
    score: float  # float32 value

    def key(self):
        # HitQueue.java:76-81 — score desc, docID asc
        return (-self.score, self.docid)
