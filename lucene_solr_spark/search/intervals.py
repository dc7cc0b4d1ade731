"""Interval queries: MINIMAL-interval algebra with nesting
(lucene/queries/src/java/org/apache/lucene/queries/intervals/).

This is the second positional algebra in the reference, distinct from
spans (search/spans.py): interval sources compute the MINIMAL
intervals of each document — an interval is reported only if it does
not properly contain another matching interval (Clarke & Cormack
"shortest substring" semantics, the package javadoc's foundation).
Spans, by contrast, enumerate greedy matches anchor-by-anchor; e.g.
for text ``a b a c`` the span-near(a, c, slop=2) match set and the
ordered-interval match set differ in exactly the minimality rule.

Sources implemented (Intervals.java factory surface):
  * term            — one interval [p, p] per position
  * ordered         — children in order, non-overlapping
                      (Intervals.ordered / OrderedIntervalsSource)
  * unordered       — minimal covering windows, overlaps allowed
                      (Intervals.unordered); ``no_overlaps=True`` for
                      the UNORDERED_NO_OVERLAP variant
  * interval_or     — union of children, minimalized
                      (Intervals.or / DisjunctionIntervalsSource)
  * phrase          — ordered with zero gaps (Intervals.phrase)
  * max_gaps        — filter: total internal gaps <= n
                      (Intervals.maxgaps / IntervalFilter.gaps())
  * max_width       — filter: end - start + 1 <= n (Intervals.maxwidth)
  * containing      — big intervals containing >= 1 small
                      (Intervals.containing / ContainedByIntervalsSource dual)
  * contained_by    — small intervals inside >= 1 big
                      (Intervals.containedBy)
  * not_containing / not_contained_by — the complements
    (Intervals.notContaining / notContainedBy)

Enumeration is per-document over the term-position arrays the engine
already materializes for phrases/spans; the engine (IndexSearcher
mapInPandas pass) and the oracle share THIS exact enumeration, so
their scores are identical by construction — the algebra itself is
verified against hand-computed goldens in tests/test_intervals.py.

Scoring: freq = float32 Σ 1/(1 + gaps(interval)) over the doc's
minimal intervals — the sloppy-frequency shape of
IntervalScorer/SpanScorer (spans/SpanScorer.java:118-141's
computeSlopFactor applied to the interval's internal gap count);
weight = scorer weight from the float32 idf-sum over the tree's terms
(IntervalQuery scores like a term query whose freq is the above —
queries/intervals/IntervalScorer.java role).

Port note (deviation, deliberate): enumeration is eager per document
(numpy position arrays), not the reference's lazy DISI conjunction —
the distributed candidate pruning happens one level up via the
doc-level boolean skeleton, same as spans.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .queries import BooleanQuery, Query, TermQuery

# interval tuple: (start, end, gaps) — start/end INCLUSIVE positions,
# gaps = internal positions not covered by child intervals


class IntervalsSource:
    pass


@dataclass(frozen=True)
class ITerm(IntervalsSource):
    term: str


@dataclass(frozen=True)
class IOrdered(IntervalsSource):
    sources: tuple


@dataclass(frozen=True)
class IUnordered(IntervalsSource):
    sources: tuple
    no_overlaps: bool = False


@dataclass(frozen=True)
class IOr(IntervalsSource):
    sources: tuple


@dataclass(frozen=True)
class IMaxGaps(IntervalsSource):
    source: IntervalsSource
    max_gaps: int


@dataclass(frozen=True)
class IMaxWidth(IntervalsSource):
    source: IntervalsSource
    max_width: int


@dataclass(frozen=True)
class IContaining(IntervalsSource):
    big: IntervalsSource
    small: IntervalsSource
    negate: bool = False


@dataclass(frozen=True)
class IContainedBy(IntervalsSource):
    small: IntervalsSource
    big: IntervalsSource
    negate: bool = False


@dataclass(frozen=True)
class INonOverlapping(IntervalsSource):
    """Intervals.nonOverlapping (:130-132) /
    DifferenceIntervalFunction.NON_OVERLAPPING (:47-52): minuend
    intervals that overlap no subtrahend interval. ``positions`` > 0
    makes it Intervals.notWithin (:145-147): the subtrahend intervals
    are widened to [max(0, start-positions), end+positions] before the
    overlap test (NotWithinFunction :215-249 wraps the subtrahend then
    delegates to NON_OVERLAPPING)."""
    minuend: IntervalsSource
    subtrahend: IntervalsSource
    positions: int = 0


# -- factory surface (Intervals.java names) --------------------------------

def term(t: str) -> ITerm:
    return ITerm(t)


def ordered(*sources) -> IOrdered:
    return IOrdered(tuple(_coerce(s) for s in sources))


def unordered(*sources, no_overlaps: bool = False) -> IUnordered:
    return IUnordered(tuple(_coerce(s) for s in sources), no_overlaps)


def interval_or(*sources) -> IOr:
    return IOr(tuple(_coerce(s) for s in sources))


def phrase(*sources) -> IMaxGaps:
    return IMaxGaps(ordered(*sources), 0)


def max_gaps(n: int, source) -> IMaxGaps:
    return IMaxGaps(_coerce(source), n)


def max_width(n: int, source) -> IMaxWidth:
    return IMaxWidth(_coerce(source), n)


def containing(big, small) -> IContaining:
    return IContaining(_coerce(big), _coerce(small))


def not_containing(big, small) -> IContaining:
    return IContaining(_coerce(big), _coerce(small), negate=True)


def contained_by(small, big) -> IContainedBy:
    return IContainedBy(_coerce(small), _coerce(big))


def not_contained_by(small, big) -> IContainedBy:
    return IContainedBy(_coerce(small), _coerce(big), negate=True)


def non_overlapping(minuend, subtrahend) -> INonOverlapping:
    return INonOverlapping(_coerce(minuend), _coerce(subtrahend))


def not_within(minuend, positions: int, subtrahend) -> INonOverlapping:
    return INonOverlapping(_coerce(minuend), _coerce(subtrahend),
                           positions)


def _coerce(s) -> IntervalsSource:
    return ITerm(s) if isinstance(s, str) else s


# -- query wrapper ----------------------------------------------------------

@dataclass(frozen=True)
class IntervalQuery(Query):
    """queries/intervals/IntervalQuery.java role: scores a field
    against an IntervalsSource."""
    source: IntervalsSource
    boost: float = 1.0
    field: str = "content"


# -- tree utilities ----------------------------------------------------------

def interval_terms(src) -> set[str]:
    """Every term in the source tree (IntervalsSource.extractTerms)."""
    if isinstance(src, IntervalQuery):
        return interval_terms(src.source)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered, IOr)):
        out: set[str] = set()
        for c in src.sources:
            out |= interval_terms(c)
        return out
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return interval_terms(src.source)
    if isinstance(src, IContaining):
        return interval_terms(src.big) | interval_terms(src.small)
    if isinstance(src, IContainedBy):
        return interval_terms(src.small) | interval_terms(src.big)
    if isinstance(src, INonOverlapping):
        return interval_terms(src.minuend) | interval_terms(src.subtrahend)
    raise TypeError(f"unknown intervals source {type(src)}")


def interval_to_boolean(q: IntervalQuery) -> Query:
    """Doc-level candidate skeleton: a doc can match only if it
    matches this boolean query (same role as span_to_boolean; the
    negated filters only constrain via their positive operand)."""

    def walk(src) -> Query:
        if isinstance(src, ITerm):
            return TermQuery(src.term, field=q.field)
        if isinstance(src, (IOrdered, IUnordered)):
            return BooleanQuery.of(must=[walk(c) for c in src.sources])
        if isinstance(src, IOr):
            return BooleanQuery.of(should=[walk(c) for c in src.sources])
        if isinstance(src, (IMaxGaps, IMaxWidth)):
            return walk(src.source)
        if isinstance(src, IContaining):
            # matches come FROM big; a negated small doesn't constrain
            return (walk(src.big) if src.negate
                    else BooleanQuery.of(must=[walk(src.big),
                                               walk(src.small)]))
        if isinstance(src, IContainedBy):
            return (walk(src.small) if src.negate
                    else BooleanQuery.of(must=[walk(src.small),
                                               walk(src.big)]))
        if isinstance(src, INonOverlapping):
            # subtractive: only the minuend constrains candidates
            return walk(src.minuend)
        raise TypeError(f"unknown intervals source {type(src)}")

    return walk(q.source)


# -- enumeration -------------------------------------------------------------

def _minimalize(ivs: list) -> list:
    """Drop every interval that properly CONTAINS another one (the
    minimal-interval rule), dedup, sort by (start, end)."""
    ivs = sorted(set((s, e, g) for s, e, g in ivs))
    out = []
    for i, (s, e, g) in enumerate(ivs):
        contains_other = any(
            (s2 >= s and e2 <= e) and (s2, e2) != (s, e)
            for s2, e2, _ in ivs)
        if not contains_other:
            out.append((s, e, g))
    return out


def enumerate_intervals(src, pos: dict[str, np.ndarray]) -> list:
    """All MINIMAL intervals of ``src`` in one document, sorted by
    (start, end). ``pos`` maps term → sorted position array."""
    if isinstance(src, ITerm):
        p = pos.get(src.term)
        if p is None or len(p) == 0:
            return []
        return [(int(x), int(x), 0) for x in p]

    if isinstance(src, IOrdered):
        subs = [enumerate_intervals(c, pos) for c in src.sources]
        if any(not s for s in subs):
            return []
        out = []
        # anchor on each first-child interval; greedily chain the
        # earliest following interval of each next child (the lazy
        # iterator's advance order), then minimalize
        for first in subs[0]:
            chain = [first]
            ok = True
            for nxt in subs[1:]:
                prev_end = chain[-1][1]
                cand = next((iv for iv in nxt if iv[0] > prev_end), None)
                if cand is None:
                    ok = False
                    break
                chain.append(cand)
            if not ok:
                continue
            s, e = chain[0][0], chain[-1][1]
            gaps = sum(c[2] for c in chain) + sum(
                chain[j][0] - chain[j - 1][1] - 1
                for j in range(1, len(chain)))
            out.append((s, e, gaps))
        return _minimalize(out)

    if isinstance(src, IUnordered):
        subs = [enumerate_intervals(c, pos) for c in src.sources]
        if any(not s for s in subs):
            return []
        ptrs = [0] * len(subs)
        out = []
        while True:
            cur = [subs[i][ptrs[i]] for i in range(len(subs))]
            s = min(c[0] for c in cur)
            e = max(c[1] for c in cur)
            valid = True
            if src.no_overlaps:
                spans_sorted = sorted((c[0], c[1]) for c in cur)
                valid = all(spans_sorted[j][0] > spans_sorted[j - 1][1]
                            for j in range(1, len(spans_sorted)))
            if valid:
                covered = len({p for c in cur
                               for p in range(c[0], c[1] + 1)})
                out.append((s, e, (e - s + 1) - covered
                            + sum(c[2] for c in cur)))
            # advance the child holding the min start (NearSpansUnordered
            # heap order)
            i_min = min(range(len(subs)), key=lambda i: (cur[i][0],
                                                         cur[i][1]))
            ptrs[i_min] += 1
            if ptrs[i_min] >= len(subs[i_min]):
                break
        return _minimalize(out)

    if isinstance(src, IOr):
        out = []
        for c in src.sources:
            out.extend(enumerate_intervals(c, pos))
        return _minimalize(out)

    if isinstance(src, IMaxGaps):
        return [iv for iv in enumerate_intervals(src.source, pos)
                if iv[2] <= src.max_gaps]

    if isinstance(src, IMaxWidth):
        return [iv for iv in enumerate_intervals(src.source, pos)
                if iv[1] - iv[0] + 1 <= src.max_width]

    if isinstance(src, IContaining):
        big = enumerate_intervals(src.big, pos)
        small = enumerate_intervals(src.small, pos)
        keep = []
        for b in big:
            has = any(s[0] >= b[0] and s[1] <= b[1] for s in small)
            if has != src.negate:
                keep.append(b)
        return keep  # big is already minimal & sorted

    if isinstance(src, IContainedBy):
        small = enumerate_intervals(src.small, pos)
        big = enumerate_intervals(src.big, pos)
        keep = []
        for s in small:
            within = any(s[0] >= b[0] and s[1] <= b[1] for b in big)
            if within != src.negate:
                keep.append(s)
        return keep

    if isinstance(src, INonOverlapping):
        minuend = enumerate_intervals(src.minuend, pos)
        if not minuend:
            return []
        subs = enumerate_intervals(src.subtrahend, pos)
        if src.positions:
            # NotWithinFunction (:215-232): widen each subtrahend
            # interval, clamping the start at 0
            subs = [(max(0, s - src.positions), e + src.positions, g)
                    for s, e, g in subs]
        return [m for m in minuend
                if not any(s[0] <= m[1] and m[0] <= s[1] for s in subs)]

    raise TypeError(f"unknown intervals source {type(src)}")


def interval_freq(q: IntervalQuery, pos: dict[str, np.ndarray]) -> float:
    """float32 Σ 1/(1 + gaps) over the doc's minimal intervals."""
    ivs = enumerate_intervals(q.source, pos)
    if not ivs:
        return 0.0
    acc = np.float32(0.0)
    for _s, _e, g in ivs:
        acc = np.float32(acc + np.float32(1.0 / (1.0 + g)))
    return float(acc)
