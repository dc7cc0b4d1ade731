"""Synonyms: Solr-format rule parsing, an index-time token filter, and
query-time expansion to :class:`~..search.queries.SynonymQuery`.

Reference semantics (all public):
  * Rule syntax — SolrSynonymParser
    (lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
    SolrSynonymParser.java:32-58): comma-separated equivalence classes
    (``couch,sofa,divan``) and explicit mappings
    (``small => little,tiny``); ``#`` comments; ``expand`` controls
    whether an equivalence class maps each member to ALL members
    (true) or only to its first member (false).
  * Filter semantics — SynonymGraphFilter
    (analysis/synonym/SynonymGraphFilter.java): injected synonyms are
    stacked at the SAME position as the matched input token
    (posIncrement 0); with ``=>`` rules the input token is consumed
    and replaced by its outputs. SINGLE-TOKEN rules only — multi-word
    synonyms need the filter's graph output (posLength attribute),
    which this engine does not model; the parser rejects them
    explicitly rather than mis-indexing.
  * Query-time expansion — QueryBuilder
    (lucene/core/src/java/org/apache/lucene/util/QueryBuilder.java:
    analyzeTerm/newSynonymQuery): tokens stacked at one position
    become ONE SynonymQuery, scored as a pseudo-term (freq = sum of
    member freqs, df = max member df — SynonymQuery.java:144-158).
"""

from __future__ import annotations

from ..search.queries import (
    BooleanClause,
    BooleanQuery,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
)


class SynonymMap:
    """Immutable synonym map.

    ``rules`` — single-token → (sorted single-token outputs), the
    index-time-safe subset; for equivalence classes with
    ``expand=True`` the term itself is a member of its own output set
    (like the reference builder's ``add(input, input)`` round-trip).

    ``graph`` — token-tuple → (output token tuples), EVERY rule
    including multi-word inputs/outputs (SynonymMap.Builder's
    full word-level FST content). Multi-word rules are query-time
    only, per the SynonymGraphFilter guidance that index-time graph
    output requires lossy flattening — ``expand_query_text`` consumes
    this map."""

    def __init__(self, rules: dict[str, tuple[str, ...]],
                 graph: dict[tuple[str, ...],
                             tuple[tuple[str, ...], ...]] | None = None):
        self.rules = {t: tuple(sorted(set(outs)))
                      for t, outs in rules.items()}
        self.graph = {k: tuple(sorted(set(v)))
                      for k, v in (graph or {}).items()}
        if not self.graph and self.rules:
            self.graph = {(t,): tuple((o,) for o in outs)
                          for t, outs in self.rules.items()}
        self.max_span = max((len(k) for k in self.graph), default=0)

    def __len__(self) -> int:
        return len(self.graph) or len(self.rules)

    def outputs(self, term: str) -> tuple[str, ...] | None:
        return self.rules.get(term)

    @property
    def has_multi(self) -> bool:
        return any(len(k) > 1 or any(len(o) > 1 for o in v)
                   for k, v in self.graph.items())

    @classmethod
    def parse(cls, rules_text: str, expand: bool = True,
              analyzer=None) -> "SynonymMap":
        """Parse Solr synonyms.txt content (SolrSynonymParser.java).

        Each side is analyzed (default: lowercase + whitespace split);
        a side of several tokens is a multi-word rule
        (``usa => united states``) and lands in the ``graph`` map for
        query-time expansion; single→single parts additionally land in
        ``rules`` for the index-time filter."""

        def norm(raw: str) -> tuple[str, ...]:
            raw = raw.strip()
            if analyzer is not None:
                return tuple(analyzer.terms(raw))
            return tuple(w for w in raw.lower().split() if w)

        graph: dict[tuple, set] = {}
        single: dict[str, set] = {}

        def add(i: tuple, outs: list[tuple]):
            if not i or not outs:
                return
            graph.setdefault(i, set()).update(outs)
            if len(i) == 1:
                s1 = [o[0] for o in outs if len(o) == 1]
                if s1:
                    single.setdefault(i[0], set()).update(s1)

        for line in rules_text.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                inputs = [norm(t) for t in lhs.split(",") if t.strip()]
                outputs = [norm(t) for t in rhs.split(",") if t.strip()]
                for i in inputs:
                    add(i, outputs)
            else:
                members = [norm(t) for t in line.split(",") if t.strip()]
                members = [m for m in members if m]
                if len(members) < 2:
                    continue
                if expand:
                    for m in members:
                        add(m, members)
                else:
                    for m in members:
                        add(m, [members[0]])
        return cls({t: tuple(s) for t, s in single.items()},
                   {k: tuple(v) for k, v in graph.items()})


def synonym_filter(syn: SynonymMap):
    """TokenFilter for :class:`~.filters.CustomAnalyzer`: index-time
    expansion. A mapped token is replaced by its outputs, ALL stacked
    at the token's position (posIncrement 0 — SynonymGraphFilter);
    unmapped tokens pass through. For ``a,b,c`` equivalence classes
    with expand=True the original survives because it is a member of
    its own output set; for ``x => y`` rules the input is consumed
    (SolrSynonymParser includeOrig=false semantics).

    Multi-word rules are refused here: indexing graph output needs the
    lossy FlattenGraphFilter, and the reference guidance is to apply
    multi-word synonyms at QUERY time (``expand_query_text``)."""

    if syn.has_multi:
        raise NotImplementedError(
            "index-time synonym filter supports single-token rules "
            "only; apply multi-word rules at query time via "
            "expand_query_text (SynonymGraphFilter javadoc guidance)")
    rules = syn.rules

    def f(terms: list[str], positions: list[int]):
        out_t: list[str] = []
        out_p: list[int] = []
        for t, p in zip(terms, positions):
            outs = rules.get(t)
            if outs is None:
                out_t.append(t)
                out_p.append(p)
            else:
                out_t.extend(outs)
                out_p.extend([p] * len(outs))
        return out_t, out_p

    return f


def expand_query(q: Query, syn: SynonymMap) -> Query:
    """Query-time synonym expansion (QueryBuilder.newSynonymQuery):
    every TermQuery whose term has synonyms becomes a SynonymQuery
    over the output set (same field, same boost); a term whose graph
    outputs include MULTI-WORD paths becomes the articulation
    disjunction (single paths as one SynonymQuery, each multi-word
    path as a PhraseQuery — QueryBuilder.analyzeGraphBoolean's
    side-path shape); BooleanQuery / nested structures rewrite
    recursively; other leaves pass through unchanged."""
    if isinstance(q, TermQuery):
        paths = syn.graph.get((q.term,))
        if not paths:
            return q
        singles = sorted({p[0] for p in paths if len(p) == 1} | {q.term})
        multis = sorted(p for p in paths if len(p) > 1)
        if not multis:
            if len(singles) == 1:
                return q
            return SynonymQuery(tuple(singles), boost=q.boost, field=q.field)
        alts: list[Query] = []
        alts.append(SynonymQuery(tuple(singles), boost=q.boost,
                                 field=q.field)
                    if len(singles) > 1
                    else TermQuery(singles[0], boost=q.boost, field=q.field))
        alts.extend(PhraseQuery(p, boost=q.boost, field=q.field)
                    for p in multis)
        return BooleanQuery(
            tuple(BooleanClause(a, "SHOULD") for a in alts))
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple(BooleanClause(expand_query(c.query, syn), c.occur)
                  for c in q.clauses),
            minimum_should_match=q.minimum_should_match,
            boost=q.boost,
        )
    return q


def expand_query_text(tokens, syn: SynonymMap, field: str | None = None,
                      occur: str = "SHOULD") -> Query:
    """QueryBuilder.analyzeGraphBoolean over analyzed query text with
    multi-word rules: scan the token stream with LONGEST-match rule
    lookup (SynonymFilter/SynonymGraphFilter FST semantics), and for
    every matched span emit the articulation disjunction — the
    original span plus each output path, single-token paths as
    TermQuery, multi-token paths as PhraseQuery (the graph side-path →
    phrase shape of QueryBuilder.analyzeGraphBoolean). Slices combine
    under ``occur`` (the default operator).

    ``tokens`` — analyzed query terms (list[str]); pass text through
    your analyzer first.
    """
    tokens = list(tokens)
    kw = {} if field is None else {"field": field}
    slices: list[Query] = []
    i = 0
    while i < len(tokens):
        span = 0
        outs = None
        for ln in range(min(syn.max_span, len(tokens) - i), 0, -1):
            key = tuple(tokens[i:i + ln])
            got = syn.graph.get(key)
            if got is not None:
                span, outs = ln, got
                break
        if outs is None:
            slices.append(TermQuery(tokens[i], **kw))
            i += 1
            continue
        orig = tuple(tokens[i:i + span])
        paths = sorted(set(outs) | {orig})
        singles = sorted({p[0] for p in paths if len(p) == 1})
        multis = [p for p in paths if len(p) > 1]
        alts: list[Query] = []
        if len(singles) > 1:
            alts.append(SynonymQuery(tuple(singles), **kw))
        elif singles:
            alts.append(TermQuery(singles[0], **kw))
        alts.extend(PhraseQuery(p, **kw) for p in multis)
        slices.append(alts[0] if len(alts) == 1 else BooleanQuery(
            tuple(BooleanClause(a, "SHOULD") for a in alts)))
        i += span
    if len(slices) == 1:
        return slices[0]
    return BooleanQuery(tuple(BooleanClause(s, occur) for s in slices))
