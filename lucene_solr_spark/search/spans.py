"""Span queries: positional algebra with nesting
(lucene/core/src/java/org/apache/lucene/search/spans/).

Query surface: SpanTermQuery, SpanNearQuery (ordered + unordered,
slop), SpanOrQuery, SpanNotQuery, SpanFirstQuery — arbitrary nesting
(the algebra the surround parser needs: ``3W(2W(a,b),c)``).

Matching semantics follow the reference spans package:
  * a span is a half-open position interval [start, end) plus the
    ``width`` (slop) it consumed (spans/Spans.java:width());
  * SpanTermQuery — one span per posting position, width 0
    (spans/SpanTermQuery.java, TermSpans);
  * SpanNearQuery ordered — sub-spans in clause order with
    start_i >= end_{i-1}; width = sum of the gaps between consecutive
    sub-spans plus the children's own widths
    (spans/NearSpansOrdered.java:111-160: stretchToOrder +
    matchWidth); enumeration advances the FIRST clause span by span
    and emits at most one (greedy-minimal) match per anchor, the
    iterator's lazy-advance behavior;
  * SpanNearQuery unordered — minimal covering windows via the
    min-start heap (spans/NearSpansUnordered.java); width =
    (maxEnd - minStart) - Σ(sub lengths) + Σ(sub widths); the heap
    advances the minimum-start sub-span after each window test;
  * SpanNotQuery — include spans that do not overlap any exclude span
    (spans/SpanNotQuery.java, pre/post = 0);
  * SpanFirstQuery — match spans with end <= n
    (spans/SpanFirstQuery.java / SpanPositionRangeQuery).

Scoring follows SpanScorer.setFreqCurrentDoc (spans/SpanScorer.java:
118-141): float32 freq = Σ 1/(1 + width) over matches in enumeration
order (SimScorer computeSlopFactor), weight from the float32 SUM of
the idfs of every term in the tree (SpanWeight.buildSimWeight →
idfExplain(termStats[])), one similarity call per doc.

Port notes (deviations, deliberate): Lucene's ordered enumeration may
revisit later first-clause spans after interior iterators advance;
this port re-seeks interior clauses per anchor (same match set on
non-pathological inputs, and ORACLE AND ENGINE share this exact
enumeration, so their scores are identical by construction).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from .queries import BooleanQuery, Query, TermQuery


@dataclass(frozen=True)
class SpanQuery(Query):
    pass


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...]
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    include: SpanQuery
    exclude: SpanQuery
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery
    end: int
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """spans/SpanPositionRangeQuery.java: keep match spans lying fully
    inside the position window [start, end] — ``acceptPosition`` at
    :60-64 requires span.start >= start AND span.end <= end.
    SpanFirstQuery is the start=0 special case."""
    match: SpanQuery
    start: int
    end: int
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanContainingQuery(SpanQuery):
    """spans/SpanContainingQuery.java: spans from ``big`` that contain
    at least one span from ``little`` (ContainSpans with big as the
    source — the emitted span, and its width, is big's)."""
    big: SpanQuery
    little: SpanQuery
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class SpanWithinQuery(SpanQuery):
    """spans/SpanWithinQuery.java: spans from ``little`` that lie
    inside some span from ``big`` (ContainSpans with little as the
    source)."""
    big: SpanQuery
    little: SpanQuery
    boost: float = 1.0
    field: str = "content"


@dataclass(frozen=True)
class FieldMaskingSpanQuery(SpanQuery):
    """spans/FieldMaskingSpanQuery.java: 'lie' about the search field
    so span queries over DIFFERENT fields can compose inside one
    SpanNear/SpanOr (the denormalized parallel-fields trick of the
    class javadoc, :40-63). The wrapped query enumerates its own
    field's positions unchanged; only the reported field — and hence
    the norms used at scoring time — is ``field`` (:66-68's caveat
    that scores mix fields is inherited)."""
    match: SpanQuery
    field: str


@dataclass(frozen=True)
class SpanMultiTermWrapper(SpanQuery):
    """spans/SpanMultiTermQueryWrapper.java: lift a multi-term query
    (prefix/wildcard/fuzzy/regexp/range) into the span algebra. Must
    be expanded against the index vocabulary (``expand_span_multiterm``
    — the SpanRewriteMethod role) before enumeration; the expansion is
    a SpanOrQuery over the matching terms, exactly the wrapper's
    top-level rewrite."""
    query: Query  # a multiterm query (PrefixQuery, WildcardQuery, ...)
    boost: float = 1.0
    field: str = "content"


def expand_span_multiterm(q: SpanQuery, vocab) -> SpanQuery:
    """Rewrite every SpanMultiTermWrapper node into a SpanOrQuery of
    SpanTermQuery over the matching index terms
    (SpanMultiTermQueryWrapper's SpanRewriteMethod: rewritten queries
    MUST be SpanQuery — here always a disjunction of term spans).

    ``vocab`` is either an iterable of index terms (oracle side; the
    match delegates to the shared ``multiterm.expand_terms``) or a
    callable ``multiterm_query -> list[str]`` (engine side — the
    dictionary-pruned scan)."""
    from .multiterm import expand_terms

    if isinstance(q, SpanMultiTermWrapper):
        if callable(vocab):
            terms = tuple(vocab(q.query))
        else:
            terms = tuple(expand_terms(vocab, q.query))
        return SpanOrQuery(
            tuple(SpanTermQuery(t, field=q.field) for t in terms),
            boost=q.boost, field=q.field)
    if isinstance(q, SpanNearQuery):
        return SpanNearQuery(
            tuple(expand_span_multiterm(c, vocab) for c in q.clauses),
            q.slop, q.in_order, q.boost, q.field)
    if isinstance(q, SpanOrQuery):
        return SpanOrQuery(
            tuple(expand_span_multiterm(c, vocab) for c in q.clauses),
            q.boost, q.field)
    if isinstance(q, SpanNotQuery):
        return SpanNotQuery(expand_span_multiterm(q.include, vocab),
                            expand_span_multiterm(q.exclude, vocab),
                            q.boost, q.field)
    if isinstance(q, SpanFirstQuery):
        return SpanFirstQuery(expand_span_multiterm(q.match, vocab),
                              q.end, q.boost, q.field)
    if isinstance(q, SpanPositionRangeQuery):
        return SpanPositionRangeQuery(
            expand_span_multiterm(q.match, vocab), q.start, q.end,
            q.boost, q.field)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return type(q)(expand_span_multiterm(q.big, vocab),
                       expand_span_multiterm(q.little, vocab),
                       q.boost, q.field)
    if isinstance(q, FieldMaskingSpanQuery):
        return FieldMaskingSpanQuery(
            expand_span_multiterm(q.match, vocab), q.field)
    return q


def span_terms(q: SpanQuery) -> set[str]:
    """Every term in the span tree (SpanWeight.extractTerms)."""
    if isinstance(q, SpanTermQuery):
        return {q.term}
    if isinstance(q, SpanNearQuery) or isinstance(q, SpanOrQuery):
        out: set[str] = set()
        for c in q.clauses:
            out |= span_terms(c)
        return out
    if isinstance(q, SpanNotQuery):
        return span_terms(q.include) | span_terms(q.exclude)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return span_terms(q.match)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return span_terms(q.big) | span_terms(q.little)
    if isinstance(q, FieldMaskingSpanQuery):
        return span_terms(q.match)
    if isinstance(q, SpanMultiTermWrapper):
        raise TypeError(
            "SpanMultiTermWrapper must be expanded against the index "
            "vocabulary first (expand_span_multiterm)")
    raise TypeError(f"unknown span query {type(q)}")


def span_field_terms(q: SpanQuery) -> set[tuple[str, str]]:
    """Every (field, term) pair in the span tree — each SpanTermQuery
    contributes its OWN field (FieldMaskingSpanQuery masks the
    reported field, never the enumerated one, so masking is
    transparent here)."""
    if isinstance(q, SpanTermQuery):
        return {(q.field, q.term)}
    if isinstance(q, (SpanNearQuery, SpanOrQuery)):
        out: set[tuple[str, str]] = set()
        for c in q.clauses:
            out |= span_field_terms(c)
        return out
    if isinstance(q, SpanNotQuery):
        return span_field_terms(q.include) | span_field_terms(q.exclude)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery,
                      FieldMaskingSpanQuery)):
        return span_field_terms(q.match)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return span_field_terms(q.big) | span_field_terms(q.little)
    if isinstance(q, SpanMultiTermWrapper):
        raise TypeError(
            "SpanMultiTermWrapper must be expanded against the index "
            "vocabulary first (expand_span_multiterm)")
    raise TypeError(f"unknown span query {type(q)}")


def span_to_boolean(q: SpanQuery) -> Query:
    """Doc-level approximation (the TwoPhaseIterator skeleton): a doc
    can only match the span query if it matches this boolean query.
    SpanNot's exclusion is positional, so only the include side
    constrains candidates."""
    if isinstance(q, SpanTermQuery):
        return TermQuery(q.term, field=q.field)
    if isinstance(q, SpanNearQuery):
        return BooleanQuery.of(
            must=[span_to_boolean(c) for c in q.clauses])
    if isinstance(q, SpanOrQuery):
        return BooleanQuery.of(
            should=[span_to_boolean(c) for c in q.clauses])
    if isinstance(q, SpanNotQuery):
        return span_to_boolean(q.include)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery,
                      FieldMaskingSpanQuery)):
        return span_to_boolean(q.match)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        # ContainSpans is a conjunction of both sides (ConjunctionSpans
        # over [big, little]) — a doc must match both
        return BooleanQuery.of(
            must=[span_to_boolean(q.big), span_to_boolean(q.little)])
    raise TypeError(f"unknown span query {type(q)}")


# span tuple: (start, end, width)

def enumerate_spans(q: SpanQuery, pos: dict[str, np.ndarray]) -> list:
    """All matches of ``q`` in ONE document, sorted by (start, end).
    ``pos``: term → sorted position array (may be missing/empty)."""
    if isinstance(q, SpanTermQuery):
        # field-aware lookup first (cross-field trees via
        # FieldMaskingSpanQuery); bare-term key for the common
        # single-field dicts
        p = pos.get((q.field, q.term), pos.get(q.term))
        if p is None:
            return []
        return [(int(x), int(x) + 1, 0) for x in p]
    if isinstance(q, SpanOrQuery):
        out = []
        for c in q.clauses:
            out.extend(enumerate_spans(c, pos))
        out.sort(key=lambda s: (s[0], s[1]))
        return out
    if isinstance(q, SpanNearQuery):
        subs = [enumerate_spans(c, pos) for c in q.clauses]
        if any(not s for s in subs):
            return []
        if len(subs) == 1:
            return subs[0]
        return (_near_ordered(subs, q.slop) if q.in_order
                else _near_unordered(subs, q.slop))
    if isinstance(q, SpanNotQuery):
        inc = enumerate_spans(q.include, pos)
        if not inc:
            return []
        exc = enumerate_spans(q.exclude, pos)
        if not exc:
            return inc
        out = []
        for s in inc:
            if not any(e[0] < s[1] and s[0] < e[1] for e in exc):
                out.append(s)
        return out
    if isinstance(q, FieldMaskingSpanQuery):
        return enumerate_spans(q.match, pos)
    if isinstance(q, SpanFirstQuery):
        return [s for s in enumerate_spans(q.match, pos) if s[1] <= q.end]
    if isinstance(q, SpanPositionRangeQuery):
        # SpanPositionRangeQuery.acceptPosition (:60-64)
        return [s for s in enumerate_spans(q.match, pos)
                if s[0] >= q.start and s[1] <= q.end]
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        bigs = enumerate_spans(q.big, pos)
        littles = enumerate_spans(q.little, pos)
        if not bigs or not littles:
            return []
        if isinstance(q, SpanContainingQuery):
            # big spans containing >= 1 little span; emitted span (and
            # width) is big's (ContainSpans sourceSpans = big)
            return [b for b in bigs
                    if any(l[0] >= b[0] and l[1] <= b[1] for l in littles)]
        # within: little spans inside some big span (source = little)
        return [l for l in littles
                if any(l[0] >= b[0] and l[1] <= b[1] for b in bigs)]
    raise TypeError(f"unknown span query {type(q)}")


def _near_ordered(subs: list, slop: int) -> list:
    """Ordered near: per first-clause anchor, greedily seek each next
    clause's earliest span starting at/after the previous end; emit
    when the total consumed slop (gaps + child widths) fits."""
    import bisect

    starts = [[s[0] for s in sub] for sub in subs]
    out = []
    for a in subs[0]:
        prev_end = a[1]
        width = a[2]
        last = a
        ok = True
        for i in range(1, len(subs)):
            j = bisect.bisect_left(starts[i], prev_end)
            if j == len(subs[i]):
                ok = False
                break
            nxt = subs[i][j]
            width += (nxt[0] - prev_end) + nxt[2]
            prev_end = nxt[1]
            last = nxt
        if ok and width <= slop:
            out.append((a[0], last[1], width))
    out.sort(key=lambda s: (s[0], s[1]))
    return out


def _near_unordered(subs: list, slop: int) -> list:
    """Unordered near: min-start heap over one current span per
    clause; test the covering window each round, then advance the
    minimum-start clause (NearSpansUnordered semantics)."""
    idx = [0] * len(subs)
    heap = [(subs[i][0][0], i) for i in range(len(subs))]
    heapq.heapify(heap)
    out = []
    while True:
        min_start = heap[0][0]
        cur = [subs[i][idx[i]] for i in range(len(subs))]
        max_end = max(c[1] for c in cur)
        total_len = sum(c[1] - c[0] for c in cur)
        child_w = sum(c[2] for c in cur)
        width = (max_end - min_start) - total_len + child_w
        if width <= slop:
            out.append((min_start, max_end, width))
        _, i = heapq.heappop(heap)
        idx[i] += 1
        if idx[i] >= len(subs[i]):
            break
        heapq.heappush(heap, (subs[i][idx[i]][0], i))
    # distinct windows only (two clauses advancing through identical
    # positions can re-test the same window)
    seen: set = set()
    ded = []
    for s in sorted(out, key=lambda s: (s[0], s[1])):
        if s not in seen:
            seen.add(s)
            ded.append(s)
    return ded


def span_freq(q: SpanQuery, pos: dict[str, np.ndarray]) -> float:
    """float32 Σ 1/(1+width) over the doc's matches in enumeration
    order (SpanScorer.setFreqCurrentDoc, computeSlopFactor)."""
    spans = enumerate_spans(q, pos)
    if not spans:
        return 0.0
    freq = np.float32(0.0)
    one = np.float32(1.0)
    for _s, _e, w in spans:
        freq = np.float32(freq + one / np.float32(1 + w))
    return float(freq)
