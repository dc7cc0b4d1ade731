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
    Query,
    SynonymQuery,
    TermQuery,
)


class SynonymMap:
    """Immutable term → (sorted output terms) map, single-token rules.

    ``rules`` values always include every output the term should emit
    at its position; for equivalence classes with ``expand=True`` the
    term itself is a member of its own output set (like the reference
    builder's ``add(input, input)`` round-trip)."""

    def __init__(self, rules: dict[str, tuple[str, ...]]):
        self.rules = {t: tuple(sorted(set(outs)))
                      for t, outs in rules.items()}

    def __len__(self) -> int:
        return len(self.rules)

    def outputs(self, term: str) -> tuple[str, ...] | None:
        return self.rules.get(term)

    @classmethod
    def parse(cls, rules_text: str, expand: bool = True,
              analyzer=None) -> "SynonymMap":
        """Parse Solr synonyms.txt content (SolrSynonymParser.java).

        Each side is analyzed (default: lowercase strip) — a side that
        analyzes to more than one token is a multi-word rule and
        raises (graph output out of scope; see module docstring)."""

        def norm(raw: str) -> str:
            raw = raw.strip()
            if analyzer is not None:
                toks = analyzer.terms(raw)
                if len(toks) != 1:
                    raise NotImplementedError(
                        f"multi-word synonym rule {raw!r}: the engine "
                        "indexes single-token synonyms only "
                        "(SynonymGraphFilter graph output not modeled)")
                return toks[0]
            if " " in raw:
                raise NotImplementedError(
                    f"multi-word synonym rule {raw!r}: single-token "
                    "rules only")
            return raw.lower()

        out: dict[str, set] = {}
        for line in rules_text.splitlines():
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                inputs = [norm(t) for t in lhs.split(",") if t.strip()]
                outputs = [norm(t) for t in rhs.split(",") if t.strip()]
                for i in inputs:
                    out.setdefault(i, set()).update(outputs)
            else:
                members = [norm(t) for t in line.split(",") if t.strip()]
                if len(members) < 2:
                    continue
                if expand:
                    for m in members:
                        out.setdefault(m, set()).update(members)
                else:
                    first = members[0]
                    for m in members:
                        out.setdefault(m, set()).add(first)
        return cls({t: tuple(s) for t, s in out.items()})


def synonym_filter(syn: SynonymMap):
    """TokenFilter for :class:`~.filters.CustomAnalyzer`: index-time
    expansion. A mapped token is replaced by its outputs, ALL stacked
    at the token's position (posIncrement 0 — SynonymGraphFilter);
    unmapped tokens pass through. For ``a,b,c`` equivalence classes
    with expand=True the original survives because it is a member of
    its own output set; for ``x => y`` rules the input is consumed
    (SolrSynonymParser includeOrig=false semantics)."""

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
    over the output set (same field, same boost); BooleanQuery /
    nested structures rewrite recursively; other leaves pass through
    unchanged."""
    if isinstance(q, TermQuery):
        outs = syn.outputs(q.term)
        if not outs:
            return q
        members = tuple(sorted(set(outs) | {q.term}))
        if len(members) == 1:
            return q
        return SynonymQuery(members, boost=q.boost, field=q.field)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple(BooleanClause(expand_query(c.query, syn), c.occur)
                  for c in q.clauses),
            minimum_should_match=q.minimum_should_match,
            boost=q.boost,
        )
    return q
