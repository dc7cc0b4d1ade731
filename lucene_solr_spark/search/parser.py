"""Classic query-parser front end: query string → Query AST.

Re-expresses Lucene's classic QueryParser (JavaCC grammar
queryparser/classic/QueryParser.jj:196-226; factory hooks
queryparser/classic/QueryParserBase.java:466-786) as a hand-rolled
recursive-descent parser over the single `content` field. Supported
surface:

    term                  analyzed TermQuery (getFieldQuery)
    "a phrase"~slop       PhraseQuery, stopword gaps keep positions
    term~  term~1         FuzzyQuery (getFuzzyQuery; default maxEdits=2,
                          FuzzyQuery.java:55)
    pref*  te?m* w*ld     PrefixQuery / WildcardQuery (getWildcardQuery /
                          getPrefixQuery, QueryParserBase.java:694,786)
    /regex/               RegexpQuery (getRegexpQuery, :753)
    [lo TO hi] {lo TO hi} TermRangeQuery incl/excl (getRangeQuery, :517)
    a AND b, a && b       conjunction — AND promotes its neighbours to
    a OR b, +a, -a, NOT a MUST; +/- / NOT set required/prohibited; the
                          clause algebra follows QueryParserBase.addClause
    (...)                 grouping; ^2.5 boost on any clause
    default operator      OR (SHOULD), as in the reference

Plain terms and phrases are analyzed with the index analyzer (the
parser owns an Analyzer exactly like the reference); terms that
analyze to nothing (stopwords) drop out of the clause list. Expanded-
term queries are lowercased but not analyzed (Analyzer.normalize
semantics).
"""

from __future__ import annotations

import re

from ..analysis.tokenizer import StandardAnalyzer
from .queries import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN_RE = re.compile(
    r"""
    \s*(
        [^\s()"]+:"(?:[^"\\]|\\.)*"(?:~\d+)?  # field:"phrase"[~slop]
      | "(?:[^"\\]|\\.)*"(?:~\d+)?      # quoted phrase with optional slop
      | /(?:[^/\\]|\\.)*/               # regex
      | \[[^\]]*\]                      # inclusive range
      | \{[^}]*\}                       # exclusive range
      | \(|\)
      | \|\||&&
      | [^\s()]+                        # bare term (may carry ~ ^ * ?)
    )""",
    re.VERBOSE,
)

_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$", re.IGNORECASE)


class QueryParseError(ValueError):
    pass


class QueryParser:
    def __init__(self, analyzer: StandardAnalyzer | None = None,
                 default_operator: str = "OR",
                 default_field: str = "content",
                 fields: tuple[str, ...] | None = None,
                 field_analyzers: dict | None = None):
        self.analyzer = analyzer or StandardAnalyzer()
        if default_operator not in ("OR", "AND"):
            raise ValueError(default_operator)
        self.default_operator = default_operator
        self.default_field = default_field
        #: known indexed fields accepted by the `field:term` syntax
        self.fields = tuple(fields) if fields is not None else (default_field,)
        #: per-field analyzer overrides (QueryParserBase.getFieldQuery
        #: analyzes with the FIELD's analyzer — the
        #: PerFieldAnalyzerWrapper / Solr schema fieldType model, pairs
        #: with build_index(analyzer={field: ...}))
        self.field_analyzers = dict(field_analyzers or {})

    def _analyzer_for(self, field: str):
        return self.field_analyzers.get(field, self.analyzer)

    # -- lexer ----------------------------------------------------------
    def _lex(self, s: str) -> list[str]:
        out, pos = [], 0
        while pos < len(s):
            m = _TOKEN_RE.match(s, pos)
            if not m:
                raise QueryParseError(f"cannot lex at {s[pos:pos+20]!r}")
            if m.group(1):
                out.append(m.group(1))
            pos = m.end()
            if m.end() == m.start():
                break
        return out

    # -- parser ---------------------------------------------------------
    def parse(self, s: str) -> Query:
        toks = self._lex(s)
        q, rest = self._parse_query(toks, 0)
        if rest != len(toks):
            raise QueryParseError(f"trailing input: {toks[rest:]}")
        return q

    def _parse_query(self, toks: list[str], i: int) -> tuple[Query, int]:
        clauses: list[BooleanClause] = []
        conj = None  # conjunction BEFORE the next clause
        while i < len(toks) and toks[i] != ")":
            t = toks[i]
            if t in ("AND", "&&"):
                conj, i = "AND", i + 1
                continue
            if t in ("OR", "||"):
                conj, i = "OR", i + 1
                continue
            mod = None
            if t in ("NOT", "!"):
                mod, i = "MUST_NOT", i + 1
                if i >= len(toks):
                    raise QueryParseError("dangling NOT")
                t = toks[i]
            elif t.startswith("+") and len(t) > 1:
                mod = "MUST"
                t = t[1:]
            elif t.startswith("-") and len(t) > 1:
                mod = "MUST_NOT"
                t = t[1:]
            sub, i = self._parse_clause(t, toks, i)
            if sub is None:  # stopword-only clause drops out
                conj = None
                continue
            self._add_clause(clauses, conj, mod, sub)
            conj = None
        if not clauses:
            return MatchAllDocsQuery(), i
        if len(clauses) == 1 and clauses[0].occur in ("SHOULD", "MUST"):
            return clauses[0].query, i
        return BooleanQuery(tuple(clauses)), i

    def _add_clause(self, clauses, conj, mod, q: Query):
        """QueryParserBase.addClause algebra: AND promotes the previous
        SHOULD clause to MUST; explicit +/-/NOT win over the operator;
        default operator decides bare clauses."""
        if conj == "AND" and clauses and clauses[-1].occur == "SHOULD":
            clauses[-1] = BooleanClause(clauses[-1].query, "MUST")
        if mod is None:
            required = (conj == "AND") or (
                self.default_operator == "AND" and conj != "OR")
            occur = "MUST" if required else "SHOULD"
        else:
            occur = mod
        clauses.append(BooleanClause(q, occur))

    def _parse_clause(self, t: str, toks: list[str], i: int):
        """One clause starting at token i (already stripped of +/-).
        Returns (query | None, next_index)."""
        if t == "(":
            sub, j = self._parse_query(toks, i + 1)
            if j >= len(toks) or toks[j] != ")":
                raise QueryParseError("unbalanced parens")
            j += 1
            boost, j = self._maybe_boost_token(toks, j)
            if boost is not None:
                sub = self._boosted(sub, boost)
            return sub, j

        # ^=N — Solr constant-score operator (ConstantScorePrefixQuery
        # syntax, SolrQueryParserBase.java handles "^=" as
        # ConstantScoreQuery(boost)): the clause matches normally but
        # scores exactly N.
        m = re.match(r"^(.*)\^=(\d+(?:\.\d+)?)$", t)
        if m:
            head, cscore = m.group(1), float(m.group(2))
            if not head.startswith('"') or re.match(
                    r'^"(?:[^"\\]|\\.)*"(?:~\d+)?$', head):
                from .queries import ConstantScoreQuery

                q = self._primitive(head)
                if q is None:
                    return None, i + 1
                return ConstantScoreQuery(q, boost=cscore), i + 1

        boost = None
        m = re.match(r"^(.*)\^(\d+(?:\.\d+)?)$", t)
        if m:
            head = m.group(1)
            # only strip ^N when the remainder is itself well-formed: a
            # non-quoted term, or a complete quoted phrase (so a ^ inside
            # the phrase body is never mangled). Classic grammar accepts
            # "phrase"^boost and "phrase"~slop^boost (QueryParser.jj).
            if not head.startswith('"') or re.match(
                    r'^"(?:[^"\\]|\\.)*"(?:~\d+)?$', head):
                t, boost = head, float(m.group(2))

        q = self._primitive(t)
        j = i + 1
        if boost is None and t.startswith('"'):
            # the lexer may split the boost into its own ^N token
            boost, j = self._maybe_boost_token(toks, j)
        if boost is not None and q is not None:
            q = self._boosted(q, boost)
        return q, j

    def _maybe_boost_token(self, toks, j):
        if j < len(toks) and re.match(r"^\^\d+(\.\d+)?$", toks[j]):
            return float(toks[j][1:]), j + 1
        return None, j

    @staticmethod
    def _boosted(q: Query, boost: float) -> Query:
        try:
            return type(q)(**{**q.__dict__, "boost": q.boost * boost})
        except TypeError:
            return q

    def _primitive(self, t: str) -> Query | None:
        # explicit field prefix (field:term in the classic grammar,
        # QueryParser.jj): accepted for every known indexed field;
        # unmistakably-field-shaped prefixes naming unknown fields are
        # a parse error (UAX#29 joins a:b into ONE token otherwise)
        qfield = self.default_field
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(?=\S)", t)
        if m and not t.startswith('"') and "//" not in t:
            field = m.group(1)
            rest = t[m.end():]
            if field in self.fields:
                t = rest
                qfield = field
            elif field.lower() == field and rest and (
                    rest[0] in "\"[{/(" or rest.endswith("*")):
                raise QueryParseError(f"unknown field {field!r}")
        # phrase
        if t.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', t)
            if not m:
                raise QueryParseError(f"bad phrase {t!r}")
            body = re.sub(r"\\(.)", r"\1", m.group(1))
            slop = int(m.group(2) or 0)
            terms, positions = self._analyzer_for(qfield).analyze(body)
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], field=qfield)
            base = positions[0]
            return PhraseQuery(tuple(terms),
                               tuple(p - base for p in positions), slop,
                               field=qfield)
        # regex
        if t.startswith("/") and t.endswith("/") and len(t) >= 2:
            return RegexpQuery(t[1:-1].replace("\\/", "/").lower(),
                               field=qfield)
        # range
        m = _RANGE_RE.match(t)
        if m:
            lo = None if m.group(2) == "*" else m.group(2).lower()
            hi = None if m.group(3) == "*" else m.group(3).lower()
            return TermRangeQuery(lo, hi,
                                  include_lower=m.group(1) == "[",
                                  include_upper=m.group(4) == "]",
                                  field=qfield)
        # fuzzy
        m = re.match(r"^(.+?)~(\d*)$", t)
        if m and "*" not in t and "?" not in t:
            edits = int(m.group(2)) if m.group(2) else 2
            return FuzzyQuery(m.group(1).lower(), max_edits=edits,
                              field=qfield)
        # wildcard / prefix
        if "*" in t or "?" in t:
            body = t.lower()
            if body.endswith("*") and "?" not in body and "*" not in body[:-1]:
                return PrefixQuery(body[:-1], field=qfield)
            return WildcardQuery(body, field=qfield)
        # plain analyzed term
        terms, positions = self._analyzer_for(qfield).analyze(t)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=qfield)
        base = positions[0]
        return PhraseQuery(tuple(terms), tuple(p - base for p in positions), 0,
                           field=qfield)


def query_from_analysis(analyzer, text: str, field: str = "content",
                        slop: int = 0) -> Query:
    """QueryBuilder.createFieldQuery role (lucene/core/.../util/
    QueryBuilder.java:107-160 analyzeTerm/analyzeBoolean/analyzePhrase/
    analyzeMultiPhrase): analyze ``text`` with ANY analyzer — including
    ones whose output stacks tokens at one position (synonym maps,
    keyword-repeat, WDGF) — and build the structurally-right query:

      one token                        → TermQuery
      one position, stacked tokens    → SynonymQuery
      many positions, no stacking     → PhraseQuery (gaps preserved)
      many positions, any stacking    → MultiPhraseQuery (per-slot
                                         alternatives)
      nothing survives analysis       → MatchNoDocsQuery
    """
    from .queries import MatchNoDocsQuery, MultiPhraseQuery, SynonymQuery

    terms, positions = analyzer.analyze(text)
    if not terms:
        return MatchNoDocsQuery()
    slots: dict[int, list[str]] = {}
    for t, p in zip(terms, positions):
        slots.setdefault(p, []).append(t)
    order = sorted(slots)
    if len(order) == 1:
        group = slots[order[0]]
        if len(group) == 1:
            return TermQuery(group[0], field=field)
        return SynonymQuery(tuple(dict.fromkeys(group)), field=field)
    base = order[0]
    rel = tuple(p - base for p in order)
    if all(len(slots[p]) == 1 for p in order):
        return PhraseQuery(tuple(slots[p][0] for p in order), rel, slop,
                           field=field)
    return MultiPhraseQuery(
        tuple(tuple(dict.fromkeys(slots[p])) for p in order), rel, slop,
        field=field)


class PrecedenceQueryParser(QueryParser):
    """The flexible/precedence parser
    (``lucene/queryparser/src/java/org/apache/lucene/queryparser/
    flexible/precedence/PrecedenceQueryParser.java`` +
    ``processors/BooleanModifiersQueryNodeProcessor.java``): identical
    term/phrase/range/boost syntax, but AND binds TIGHTER than OR —
    ``a AND b OR c`` parses as ``(a AND b) OR c``, where the classic
    parser's flat addClause algebra yields ``+a +b c``.

    Implementation: the clause walk collects (separator, modifier,
    query) triples; consecutive clauses separated by AND (explicitly,
    or implicitly when the default operator is AND) fold into one
    MUST-group; OR starts a new group; groups combine as SHOULD.
    Explicit +/-/NOT modifiers win inside their group, exactly like
    the reference's modifiers processor.
    """

    def _parse_query(self, toks: list[str], i: int) -> tuple[Query, int]:
        items: list[tuple[str | None, str | None, Query]] = []
        conj = None
        while i < len(toks) and toks[i] != ")":
            t = toks[i]
            if t in ("AND", "&&"):
                conj, i = "AND", i + 1
                continue
            if t in ("OR", "||"):
                conj, i = "OR", i + 1
                continue
            mod = None
            if t in ("NOT", "!"):
                mod, i = "MUST_NOT", i + 1
                if i >= len(toks):
                    raise QueryParseError("dangling NOT")
                t = toks[i]
            elif t.startswith("+") and len(t) > 1:
                mod = "MUST"
                t = t[1:]
            elif t.startswith("-") and len(t) > 1:
                mod = "MUST_NOT"
                t = t[1:]
            sub, i = self._parse_clause(t, toks, i)
            if sub is None:  # stopword-only clause drops out
                conj = None
                continue
            items.append((conj, mod, sub))
            conj = None
        if not items:
            return MatchAllDocsQuery(), i

        # partition into AND-groups (implicit separator = default op)
        groups: list[list[tuple[str | None, Query]]] = [[]]
        for k, (sep, mod, sub) in enumerate(items):
            if k > 0:
                eff = sep or self.default_operator
                if eff == "OR":
                    groups.append([])
            groups[-1].append((mod, sub))

        def build_group(members) -> tuple[Query, str] | None:
            """→ (query, top-level occur) for one AND-group."""
            if len(members) == 1:
                mod, sub = members[0]
                return sub, (mod or "SHOULD")
            clauses = tuple(
                BooleanClause(sub, mod or "MUST") for mod, sub in members)
            return BooleanQuery(clauses), "SHOULD"

        if len(groups) == 1:
            # a multi-member single group is by construction all
            # AND-joined; a lone member keeps its modifier
            members = groups[0]
            if len(members) == 1:
                mod, sub = members[0]
                if mod is None or mod == "MUST":
                    return sub, i
                return BooleanQuery((BooleanClause(sub, mod),)), i
            return BooleanQuery(tuple(
                BooleanClause(sub, mod or "MUST")
                for mod, sub in members)), i

        top = []
        for g in groups:
            built = build_group(g)
            q, occ = built
            top.append(BooleanClause(q, occ))
        return BooleanQuery(tuple(top)), i
