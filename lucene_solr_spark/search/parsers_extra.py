"""Additional query-parser front ends: SimpleQueryParser and
ComplexPhraseQueryParser.

* :class:`SimpleQueryParser` re-expresses
  queryparser/simple/SimpleQueryParser.java: the end-user-safe grammar
  (`+` AND, `|` OR, `-` NOT, quoted phrases with `~slop`, trailing-`*`
  prefix, `~N` fuzzy, parentheses) that NEVER raises — malformed input
  degrades to plain term queries (the class javadoc's contract:
  "designed against a simple syntax ... any errors in the syntax are
  ignored and the parser does the best it can").  Operator precedence
  here is conventional (`|` binds loosest; whitespace applies the
  default operator at the same level as `+`), which matches the
  reference's observable behavior on non-pathological input.

* :class:`ComplexPhraseQueryParser` re-expresses
  queryparser/complexPhrase/ComplexPhraseQueryParser.java: phrases may
  embed wildcard / prefix / fuzzy elements and single-slot
  alternative groups — ``"(john jonathan~) smith*"~2`` — which expand
  against the term dictionary into a :class:`MultiPhraseQuery`
  (the reference rewrites the embedded queries inside a
  SpanNearQuery; slot-alternative MultiPhrase + sloppy matching is
  this engine's equivalent machinery).  Expansion is injected as a
  callable so the same parser serves the Spark searcher
  (``searcher._expand``) and the pure-Python oracle.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

from ..analysis.tokenizer import StandardAnalyzer
from .queries import (
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


class SimpleQueryParser:
    """Never-throwing end-user query parser (SimpleQueryParser.java)."""

    def __init__(self, analyzer: StandardAnalyzer | None = None,
                 default_operator: str = "OR",
                 default_field: str = "content"):
        self.analyzer = analyzer or StandardAnalyzer()
        self.default_operator = "AND" if default_operator == "AND" else "OR"
        self.default_field = default_field

    # one token: phrase (possibly unterminated), operator, paren, word
    _TOKEN_RE = re.compile(
        r"""\s*(
            "(?:[^"\\]|\\.)*(?:"(?:~\d+)?)?   # phrase, maybe unterminated
          | [+|()-]                            # operators
          | [^\s+|()"-]+                       # word (may carry ~ *)
        )""",
        re.VERBOSE,
    )

    def parse(self, s: str) -> Query:
        try:
            toks = []
            pos = 0
            while pos < len(s):
                m = self._TOKEN_RE.match(s, pos)
                if not m or m.end() == pos:
                    pos += 1  # skip unlexable char (graceful)
                    continue
                toks.append(m.group(1))
                pos = m.end()
            q, _ = self._or_expr(toks, 0)
            return q if q is not None else MatchAllDocsQuery()
        except Exception:  # the never-throw contract
            terms = self.analyzer.analyze(s)[0]
            if not terms:
                return MatchAllDocsQuery()
            return BooleanQuery.of(
                should=[TermQuery(t, field=self.default_field) for t in terms])

    # -- grammar: or := and ('|' and)* ; and := unary ((ws|'+') unary)*
    def _or_expr(self, toks, i):
        parts = []
        while True:
            q, i = self._and_expr(toks, i)
            if q is not None:
                parts.append(q)
            if i < len(toks) and toks[i] == "|":
                i += 1
                continue
            break
        if not parts:
            return None, i
        if len(parts) == 1:
            return parts[0], i
        return BooleanQuery.of(should=parts), i

    def _and_expr(self, toks, i):
        pos_qs: list[Query] = []
        neg_qs: list[Query] = []
        must = self.default_operator == "AND"
        pending_and = False
        while i < len(toks) and toks[i] not in ("|", ")"):
            t = toks[i]
            if t == "+":
                pending_and = True
                i += 1
                continue
            neg = False
            if t == "-":
                neg = True
                i += 1
                if i >= len(toks):
                    break
                t = toks[i]
                if t in ("+", "|", "-"):  # dangling '-': ignore
                    continue
            if t == "(":
                q, i = self._or_expr(toks, i + 1)
                if i < len(toks) and toks[i] == ")":
                    i += 1  # else: unbalanced — auto-close (graceful)
            else:
                q = self._primitive(t)
                i += 1
            if q is None:
                continue
            (neg_qs if neg else pos_qs).append(q)
        if not pos_qs and not neg_qs:
            return None, i
        if not pos_qs:
            return BooleanQuery.of(must=[MatchAllDocsQuery()],
                                   must_not=neg_qs), i
        if len(pos_qs) == 1 and not neg_qs:
            return pos_qs[0], i
        occur = "MUST" if (must or pending_and) else "SHOULD"
        clauses = tuple(
            [BooleanClause(q, occur) for q in pos_qs]
            + [BooleanClause(q, "MUST_NOT") for q in neg_qs])
        return BooleanQuery(clauses), i

    def _primitive(self, t: str) -> Query | None:
        f = self.default_field
        if t.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', t)
            body = m.group(1) if m else t.strip('"')
            slop = int(m.group(2)) if m and m.group(2) else 0
            body = re.sub(r"\\(.)", r"\1", body)
            terms, positions = self.analyzer.analyze(body)
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], field=f)
            base = positions[0]
            return PhraseQuery(tuple(terms),
                               tuple(p - base for p in positions), slop,
                               field=f)
        m = re.match(r"^(.+?)~(\d*)$", t)
        if m and "*" not in t:
            edits = int(m.group(2)) if m.group(2) else 2
            return FuzzyQuery(m.group(1).lower(), max_edits=min(edits, 2),
                              field=f)
        if t.endswith("*") and len(t) > 1 and "*" not in t[:-1]:
            return PrefixQuery(t[:-1].lower(), field=f)
        terms, positions = self.analyzer.analyze(t)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field=f)
        base = positions[0]
        return PhraseQuery(tuple(terms), tuple(p - base for p in positions),
                           0, field=f)


class ComplexPhraseQueryParser:
    """Wildcards/fuzzy/alternative-groups INSIDE phrases
    (ComplexPhraseQueryParser.java), expanded to MultiPhraseQuery."""

    def __init__(self, expand: Callable[[MultiTermQuery], Iterable[str]],
                 analyzer: StandardAnalyzer | None = None,
                 default_field: str = "content"):
        self.expand = expand
        self.analyzer = analyzer or StandardAnalyzer()
        self.default_field = default_field

    _PHRASE_RE = re.compile(r'^\s*"((?:[^"\\]|\\.)*)"(?:~(\d+))?\s*$')

    def parse(self, s: str) -> Query:
        """Parse ONE complex phrase: ``"..."[~slop]``. (Outside
        phrases the reference defers to the classic parser; compose
        with :class:`..search.parser.QueryParser` for full strings.)"""
        m = self._PHRASE_RE.match(s)
        if not m:
            raise ValueError(f"not a phrase: {s!r}")
        body, slop = m.group(1), int(m.group(2) or 0)
        slots = self._slots(body)
        if not slots:
            return MatchAllDocsQuery()
        termss: list[tuple[str, ...]] = []
        for alternatives in slots:
            slot_terms: list[str] = []
            for prim in alternatives:
                if isinstance(prim, str):
                    slot_terms.append(prim)
                else:
                    slot_terms.extend(self.expand(prim))
            if not slot_terms:
                return MatchNoDocsQuery()  # unmatchable slot
            termss.append(tuple(dict.fromkeys(slot_terms)))
        if len(termss) == 1:
            alts = termss[0]
            if len(alts) == 1:
                return TermQuery(alts[0], field=self.default_field)
            return BooleanQuery.of(
                should=[TermQuery(t, field=self.default_field) for t in alts])
        if all(len(a) == 1 for a in termss):
            return PhraseQuery(tuple(a[0] for a in termss),
                               tuple(range(len(termss))), slop,
                               field=self.default_field)
        return MultiPhraseQuery(tuple(termss), tuple(range(len(termss))),
                                slop, field=self.default_field)

    def _slots(self, body: str) -> list[list]:
        """Split the phrase body into slots; a ``( ... )`` group's
        members are alternatives for one slot."""
        slots: list[list] = []
        i, n = 0, len(body)
        while i < n:
            c = body[i]
            if c.isspace():
                i += 1
                continue
            if c == "(":
                j = body.find(")", i + 1)
                if j < 0:
                    j = n
                group = body[i + 1 : j]
                alts = []
                for w in group.split():
                    alts.extend(self._word(w))
                slots.append(alts)
                i = j + 1
                continue
            j = i
            while j < n and not body[j].isspace() and body[j] != "(":
                j += 1
            slots.append(self._word(body[i:j]))
            i = j
        return slots

    def _word(self, w: str) -> list:
        """One phrase element → plain term(s) or a MultiTermQuery."""
        f = self.default_field
        m = re.match(r"^(.+?)~(\d*)$", w)
        if m and "*" not in w and "?" not in w:
            edits = int(m.group(2)) if m.group(2) else 2
            return [FuzzyQuery(m.group(1).lower(), max_edits=min(edits, 2),
                               field=f)]
        if "*" in w or "?" in w:
            body = w.lower()
            if body.endswith("*") and "?" not in body and "*" not in body[:-1]:
                return [PrefixQuery(body[:-1], field=f)]
            return [WildcardQuery(body, field=f)]
        return self.analyzer.analyze(w)[0]


class SurroundQueryParser:
    """Surround query language (queryparser/surround/parser/
    QueryParser.jj): distance operators ``W`` (ordered) / ``N``
    (unordered) in infix (``a W b``) and prefix (``3W(a, b)``) form,
    boolean ``AND``/``OR``/``NOT``, parentheses, trailing-``*``
    prefixes and ``?``/``*`` wildcards, ``^boost``.

    Mapping to this engine — the same algebra as the reference
    (surround compiles to SpanQuery):

      * ``a W b … W z`` / ``nW(...)`` / ``nN(...)`` →
        SpanNearQuery(slop = n-1, inOrder = W), exactly
        surround/query/DistanceQuery.java:74-97; arbitrary nesting
        (``3W(2W(a,b),c)``) composes through search/spans.py.
      * wildcard/prefix elements inside a distance op expand against
        the dictionary (``expand`` callable) into a SpanOrQuery —
        the SpanNearClauseFactory / SrndTruncQuery role.
      * AND/OR/NOT → BooleanQuery (surround/query/AndQuery.java,
        OrQuery.java, NotQuery.java).
    """

    _TOK = re.compile(
        r"""\s*(
            \(|\)|,
          | \d+[WwNn]\b
          | [Ww]\b | [Nn]\b
          | [Aa][Nn][Dd]\b | [Oo][Rr]\b | [Nn][Oo][Tt]\b
          | \^\d+(?:\.\d+)?
          | [^\s(),^]+
        )""",
        re.VERBOSE,
    )

    def __init__(self, expand: Callable[[MultiTermQuery], Iterable[str]] | None = None,
                 default_field: str = "content"):
        self.expand = expand
        self.default_field = default_field

    def parse(self, s: str) -> Query:
        toks = self._TOK.findall(s)
        if not toks:
            return MatchAllDocsQuery()
        q, i = self._or_expr(toks, 0)
        if i != len(toks):
            raise ValueError(f"trailing tokens: {toks[i:]}")
        return q

    # or := and (OR and)* ; and := not (AND not)* ; not := dist (NOT dist)*
    def _or_expr(self, toks, i):
        q, i = self._and_expr(toks, i)
        shoulds = [q]
        while i < len(toks) and toks[i].upper() == "OR":
            r, i = self._and_expr(toks, i + 1)
            shoulds.append(r)
        return (shoulds[0] if len(shoulds) == 1
                else BooleanQuery.of(should=shoulds)), i

    def _and_expr(self, toks, i):
        q, i = self._not_expr(toks, i)
        musts = [q]
        while i < len(toks) and toks[i].upper() == "AND":
            r, i = self._not_expr(toks, i + 1)
            musts.append(r)
        return (musts[0] if len(musts) == 1
                else BooleanQuery.of(must=musts)), i

    def _not_expr(self, toks, i):
        q, i = self._dist_expr(toks, i)
        while i < len(toks) and toks[i].upper() == "NOT":
            r, i = self._dist_expr(toks, i + 1)
            q = BooleanQuery.of(must=[q], must_not=[r])
        return q, i

    def _dist_expr(self, toks, i):
        """Infix W/N chains: a W b W c (distance 1)."""
        q, i = self._primary(toks, i)
        elems, ops = [q], []
        while i < len(toks) and toks[i].upper() in ("W", "N"):
            ops.append(toks[i].upper())
            r, i = self._primary(toks, i + 1)
            elems.append(r)
        if not ops:
            return q, i
        ordered = all(o == "W" for o in ops)
        return self._near(elems, 1, ordered), i

    def _primary(self, toks, i):
        if i >= len(toks):
            raise ValueError("unexpected end of query")
        t = toks[i]
        m = re.match(r"^(\d+)([WwNn])$", t)
        if m:  # prefix distance op: 3W(a, b[, c])
            n, op = int(m.group(1)), m.group(2).upper()
            if i + 1 >= len(toks) or toks[i + 1] != "(":
                raise ValueError(f"expected ( after {t}")
            elems, i = self._list(toks, i + 2)
            return self._boosted(self._near(elems, n, op == "W"), toks, i)
        if t == "(":
            q, i = self._or_expr(toks, i + 1)
            if i >= len(toks) or toks[i] != ")":
                raise ValueError("unbalanced (")
            return self._boosted(q, toks, i + 1)
        return self._boosted(self._atom(t), toks, i + 1)

    def _list(self, toks, i):
        elems = []
        while True:
            q, i = self._or_expr(toks, i)
            elems.append(q)
            if i < len(toks) and toks[i] == ",":
                i += 1
                continue
            if i < len(toks) and toks[i] == ")":
                return elems, i + 1
            raise ValueError("expected , or ) in distance list")

    def _boosted(self, q: Query, toks, i):
        if i < len(toks) and toks[i].startswith("^"):
            import dataclasses

            q = dataclasses.replace(q, boost=q.boost * float(toks[i][1:]))
            i += 1
        return q, i

    def _atom(self, t: str) -> Query:
        f = self.default_field
        w = t.lower()
        if "*" in w or "?" in w:
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return PrefixQuery(w[:-1], field=f)
            return WildcardQuery(w, field=f)
        return TermQuery(w, field=f)

    def _to_span(self, e: Query):
        """Element of a distance op → SpanQuery (the reference's
        SpanNearClauseFactory role, surround/query/
        SpanNearClauseFactory.java): terms → SpanTermQuery, truncated
        terms expand against the dictionary into a SpanOrQuery, nested
        distance ops are already SpanNearQuery, OR groups → SpanOr.
        Returns None when an expansion is empty (distance op requires
        all sub queries → MatchNoDocs, DistanceQuery.java:85-91)."""
        from .spans import SpanNearQuery, SpanOrQuery, SpanQuery, SpanTermQuery

        if isinstance(e, SpanQuery):
            return e
        if isinstance(e, TermQuery):
            return SpanTermQuery(e.term, field=self.default_field)
        if isinstance(e, MultiTermQuery):
            if self.expand is None:
                raise ValueError(
                    "wildcard inside a distance op needs an expand "
                    "callable (dictionary access)")
            alts = tuple(dict.fromkeys(self.expand(e)))
            if not alts:
                return None
            if len(alts) == 1:
                return SpanTermQuery(alts[0], field=self.default_field)
            return SpanOrQuery(
                tuple(SpanTermQuery(t, field=self.default_field)
                      for t in alts), field=self.default_field)
        if isinstance(e, BooleanQuery) and e.clauses and all(
                c.occur == "SHOULD" for c in e.clauses):
            subs = [self._to_span(c.query) for c in e.clauses]
            if any(s is None for s in subs):
                return None
            return SpanOrQuery(tuple(subs), field=self.default_field)
        raise ValueError(
            f"distance op over {type(e).__name__} unsupported")

    def _near(self, elems: list[Query], n: int, ordered: bool) -> Query:
        """Distance op → SpanNearQuery(clauses, slop = n-1, inOrder=W)
        exactly like the reference (surround/query/DistanceQuery.java:
        74-97 getSpanNearQuery: ``new SpanNearQuery(spanClauses,
        getOpDistance() - 1, subQueriesOrdered())``). Nesting
        (``3W(2W(a,b),c)``) and OR groups inside distance ops compose
        through the span algebra (search/spans.py)."""
        from .spans import SpanNearQuery

        spans = []
        for e in elems:
            s = self._to_span(e)
            if s is None:
                return MatchNoDocsQuery()
            spans.append(s)
        return SpanNearQuery(tuple(spans), slop=n - 1, in_order=ordered,
                             field=self.default_field)


class XmlQueryParser:
    """Lucene XML query syntax (queryparser/xml/CoreParser.java and
    its builders/*.java), over this engine's query algebra.

    Supported elements (the core builder set): TermQuery,
    TermsQuery (analyzed, OR semantics — TermsQueryBuilder.java),
    BooleanQuery/Clause (occurs = must | should | mustNot | filter),
    DisjunctionMaxQuery (tieBreaker), MatchAllDocsQuery,
    ConstantScoreQuery, RangeQuery (TermRangeQuery via
    RangeQueryBuilder.java), PhraseQuery (analyzed text), UserQuery
    (delegates to the classic QueryParser — UserInputQueryBuilder.
    java). ``boost`` attributes apply everywhere. Unknown elements
    raise ValueError (ParserException role).
    """

    def __init__(self, classic_parser=None,
                 analyzer: StandardAnalyzer | None = None,
                 default_field: str = "content"):
        self.classic = classic_parser
        self.analyzer = analyzer or StandardAnalyzer()
        self.default_field = default_field

    def parse(self, xml: str) -> Query:
        import xml.etree.ElementTree as ET

        return self._build(ET.fromstring(xml))

    def _build(self, el) -> Query:
        import dataclasses

        tag = el.tag
        f = el.get("fieldName", self.default_field)
        boost = float(el.get("boost", "1.0"))

        def b(q: Query) -> Query:
            return dataclasses.replace(q, boost=q.boost * boost) \
                if boost != 1.0 else q

        if tag == "TermQuery":
            return b(TermQuery((el.text or "").strip().lower(), field=f))
        if tag == "TermsQuery":
            terms = self.analyzer.analyze(el.text or "")[0]
            if not terms:
                return MatchNoDocsQuery()
            return b(BooleanQuery.of(
                should=[TermQuery(t, field=f) for t in terms]))
        if tag == "PhraseQuery":
            terms, positions = self.analyzer.analyze(el.text or "")
            if not terms:
                return MatchNoDocsQuery()
            return b(PhraseQuery(tuple(terms), tuple(positions),
                                 int(el.get("slop", "0")), field=f))
        if tag == "BooleanQuery":
            occur_map = {"must": "MUST", "should": "SHOULD",
                         "mustNot": "MUST_NOT", "filter": "FILTER"}
            clauses = []
            for cl in el:
                if cl.tag != "Clause":
                    raise ValueError(f"BooleanQuery child {cl.tag}")
                occ = occur_map.get(cl.get("occurs", "should"))
                if occ is None:
                    raise ValueError(f"bad occurs {cl.get('occurs')}")
                subs = list(cl)
                if len(subs) != 1:
                    raise ValueError("Clause needs exactly one child")
                clauses.append(BooleanClause(self._build(subs[0]), occ))
            return b(BooleanQuery(
                tuple(clauses),
                int(el.get("minimumNumberShouldMatch", "0"))))
        if tag == "DisjunctionMaxQuery":
            return b(DisjunctionMaxQuery(
                tuple(self._build(c) for c in el),
                tie_breaker=float(el.get("tieBreaker", "0.0"))))
        if tag == "MatchAllDocsQuery":
            return MatchAllDocsQuery()
        if tag == "ConstantScoreQuery":
            subs = list(el)
            if len(subs) != 1:
                raise ValueError("ConstantScoreQuery needs one child")
            return b(ConstantScoreQuery(self._build(subs[0])))
        if tag == "RangeQuery":
            return b(TermRangeQuery(
                lower=el.get("lowerTerm"), upper=el.get("upperTerm"),
                include_lower=el.get("includeLower", "true") == "true",
                include_upper=el.get("includeUpper", "true") == "true",
                field=f))
        if tag == "UserQuery":
            if self.classic is None:
                raise ValueError("UserQuery needs a classic_parser")
            return b(self.classic.parse((el.text or "").strip()))
        if tag in ("SpanTerm", "SpanNear", "SpanOr", "SpanOrTerms",
                   "SpanFirst", "SpanNot"):
            return b(self._build_span(el))
        raise ValueError(f"unsupported query element <{tag}>")

    def _build_span(self, el):
        """The xml/builders Span* set (SpanQueryBuilderFactory.java
        wiring): SpanTerm, SpanNear (slopAttr + inOrderAttr,
        SpanNearBuilder.java:36-46), SpanOr, SpanOrTerms (analyzes the
        text into a disjunction of term spans,
        SpanOrTermsBuilder.java:44-60), SpanFirst (endAttr,
        SpanFirstBuilder.java:33-41), SpanNot (Include/Exclude child
        wrappers, SpanNotBuilder.java:33-44)."""
        from .spans import (
            SpanFirstQuery,
            SpanNearQuery,
            SpanNotQuery,
            SpanOrQuery,
            SpanTermQuery,
        )

        tag = el.tag
        f = el.get("fieldName", self.default_field)
        if tag == "SpanTerm":
            return SpanTermQuery((el.text or "").strip(), field=f)
        if tag == "SpanNear":
            clauses = tuple(self._build_span(c) for c in el)
            if not clauses:
                raise ValueError("SpanNear needs at least one clause")
            return SpanNearQuery(
                clauses, slop=int(el.get("slop", "0")),
                in_order=el.get("inOrder", "true") == "true", field=f)
        if tag == "SpanOr":
            return SpanOrQuery(
                tuple(self._build_span(c) for c in el), field=f)
        if tag == "SpanOrTerms":
            terms, _pos = self.analyzer.analyze((el.text or "").strip())
            if not terms:
                raise ValueError("SpanOrTerms analyzed to no tokens")
            return SpanOrQuery(
                tuple(SpanTermQuery(t, field=f)
                      for t in dict.fromkeys(terms)), field=f)
        if tag == "SpanFirst":
            (child,) = list(el)
            return SpanFirstQuery(self._build_span(child),
                                  end=int(el.get("end", "0")), field=f)
        if tag == "SpanNot":
            inc = el.find("Include")
            exc = el.find("Exclude")
            if inc is None or exc is None:
                raise ValueError("SpanNot needs Include and Exclude")
            (iq,) = list(inc)
            (eq,) = list(exc)
            return SpanNotQuery(self._build_span(iq),
                                self._build_span(eq), field=f)
        raise ValueError(f"unsupported span element <{tag}>")
