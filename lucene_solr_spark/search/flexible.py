"""Flexible StandardQueryParser — the config-handler front end.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
flexible/standard/StandardQueryParser.java (the "new" parser framework:
syntax tree -> processor pipeline -> builders, configured through
StandardQueryConfigHandler). Its grammar matches the classic parser;
what the framework adds is the CONFIGURATION surface and the processor
pipeline — multi-field expansion (MultiFieldQueryNodeProcessor.java),
per-field boosts (FieldBoostMapFCListener), default phrase slop
(DefaultPhraseSlopQueryNodeProcessor.java), fuzzy config
(FuzzyQueryNodeProcessor), the leading-wildcard gate
(AllowLeadingWildcardProcessor.java), and numeric points configs.

Rendering here: parse with the proven classic grammar
(search/parser.QueryParser — identical syntax), then run the processor
pipeline as an AST rewrite. Every setter mirrors a
StandardQueryParser setter (file:line cited inline); the precedence
divergence of the old flexible/precedence variant lives in
parser.PrecedenceQueryParser.
"""

from __future__ import annotations

from dataclasses import replace

from ..analysis import StandardAnalyzer
from .parser import QueryParseError, QueryParser
from .queries import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

#: leaf types the multi-field processor expands across fields
_FIELDED_LEAVES = (TermQuery, PhraseQuery, PrefixQuery, WildcardQuery,
                   FuzzyQuery, TermRangeQuery)


class StandardQueryParser:
    """StandardQueryParser.java:105-130 — ``parse(query, defaultField)``
    with a mutable configuration."""

    def __init__(self, analyzer: StandardAnalyzer | None = None):
        self._analyzer = analyzer or StandardAnalyzer()
        self._default_operator = "OR"     # :166-185 (Operator.OR default)
        self._allow_leading_wildcard = False  # :192,351
        self._multi_fields: tuple[str, ...] | None = None  # :255-271
        self._fields_boost: dict[str, float] = {}  # :429-438
        self._phrase_slop = 0             # :334,396
        self._fuzzy_min_sim = 2.0         # :412,366 (maxEdits when >= 1)
        self._fuzzy_prefix_length = 0     # :282,382

    # -- configuration handlers (setter names mirror the reference) ----
    def setAnalyzer(self, analyzer) -> None:            # :338
        self._analyzer = analyzer

    def getAnalyzer(self):                              # :343
        return self._analyzer

    def setDefaultOperator(self, op: str) -> None:      # :178
        if op not in ("OR", "AND"):
            raise ValueError(op)
        self._default_operator = op

    def getDefaultOperator(self) -> str:                # :166
        return self._default_operator

    def setAllowLeadingWildcard(self, allow: bool) -> None:  # :192
        self._allow_leading_wildcard = bool(allow)

    def getAllowLeadingWildcard(self) -> bool:          # :351
        return self._allow_leading_wildcard

    def setMultiFields(self, fields) -> None:           # :255
        self._multi_fields = tuple(fields) if fields else None

    def getMultiFields(self):                           # :271
        return self._multi_fields

    def setFieldsBoost(self, boosts: dict) -> None:     # :429
        self._fields_boost = dict(boosts or {})

    def getFieldsBoost(self) -> dict:                   # :438
        return dict(self._fields_boost)

    def setPhraseSlop(self, slop: int) -> None:         # :334
        self._phrase_slop = int(slop)

    def getPhraseSlop(self) -> int:                     # :396
        return self._phrase_slop

    def setFuzzyMinSim(self, v: float) -> None:         # :412
        self._fuzzy_min_sim = float(v)

    def getFuzzyMinSim(self) -> float:                  # :366
        return self._fuzzy_min_sim

    def setFuzzyPrefixLength(self, n: int) -> None:     # :282
        self._fuzzy_prefix_length = int(n)

    def getFuzzyPrefixLength(self) -> int:              # :382
        return self._fuzzy_prefix_length

    # -- parse ----------------------------------------------------------
    def parse(self, query: str, default_field: str = "content") -> Query:
        fields = self._multi_fields or (default_field,)
        inner = QueryParser(
            analyzer=self._analyzer,
            default_operator=self._default_operator,
            default_field=fields[0],
            # accept every known field in field:term syntax
            fields=tuple(dict.fromkeys(
                fields + tuple(self._fields_boost))))
        q = inner.parse(query)
        q = self._process(q, fields, expand=self._multi_fields is not None,
                          default_field=fields[0])
        return q

    # -- processor pipeline (AST rewrites) ------------------------------
    def _process(self, q: Query, fields, expand: bool,
                 default_field: str) -> Query:
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(BooleanClause(
                    self._process(c.query, fields, expand, default_field),
                    c.occur) for c in q.clauses),
                minimum_should_match=q.minimum_should_match,
                boost=q.boost)
        if isinstance(q, (DisjunctionMaxQuery,)):
            return DisjunctionMaxQuery(
                tuple(self._process(d, fields, expand, default_field)
                      for d in q.disjuncts), q.tie_breaker, q.boost)
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(
                self._process(q.query, fields, expand, default_field),
                q.boost)
        if isinstance(q, MatchAllDocsQuery):
            return q
        if not isinstance(q, _FIELDED_LEAVES):
            return q
        # AllowLeadingWildcardProcessor.java:52-66
        if isinstance(q, WildcardQuery) and not self._allow_leading_wildcard \
                and q.pattern[:1] in ("*", "?"):
            raise QueryParseError(
                "leading wildcard not allowed "
                "(setAllowLeadingWildcard(true) to enable)")
        # DefaultPhraseSlopQueryNodeProcessor.java:50-72: the configured
        # slop applies to phrases WITHOUT an explicit ~N
        if isinstance(q, PhraseQuery) and q.slop == 0 and self._phrase_slop:
            q = replace(q, slop=self._phrase_slop)
        # FuzzyQueryNodeProcessor: minSim >= 1 is an edit count
        if isinstance(q, FuzzyQuery):
            q = replace(q, max_edits=max(1, int(self._fuzzy_min_sim)),
                        prefix_length=self._fuzzy_prefix_length)
        if not expand or q.field != default_field:
            return self._boosted(q)
        # MultiFieldQueryNodeProcessor.java:62-98: a leaf without an
        # explicit field expands across the multi-fields, OR-combined
        expanded = tuple(self._boosted(replace(q, field=f))
                         for f in fields)
        if len(expanded) == 1:
            return expanded[0]
        return BooleanQuery(tuple(
            BooleanClause(e, "SHOULD") for e in expanded))

    def _boosted(self, q: Query) -> Query:
        b = self._fields_boost.get(getattr(q, "field", None))
        if b is None or b == 1.0:
            return q
        return replace(q, boost=q.boost * b)
