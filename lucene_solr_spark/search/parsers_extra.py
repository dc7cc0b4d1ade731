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
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
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
