"""Solr local-params query syntax + the standardPlugins QParser registry.

``{!type key=val key2='quoted val' v=$ref}body`` dispatch per
``solr/core/src/java/org/apache/solr/search/QParserPlugin.java:46-88``
(the 41-entry ``standardPlugins`` map) and
``QueryParsing.java`` / ``StrParser`` local-params grammar:

* first bare token (no ``=``) names the parser type (default
  ``lucene``),
* values quote with ``'`` or ``"`` (backslash escapes),
* ``$name`` dereferences the request-params map (multi-valued params
  are lists),
* the local ``v`` param overrides the text after ``}``.

Parsers lowered here and the reference classes they follow:

=============  ==========================================================
lucene         LuceneQParserPlugin → classic QueryParser
field          FieldQParserPlugin (analyze → term/phrase)
raw / term     RawQParserPlugin / TermQParserPlugin (no analysis)
prefix         PrefixQParserPlugin
terms          TermsQParserPlugin (separator-split TermInSet)
bool           BoolQParserPlugin.java:36-58 (must/must_not/should/filter)
filters        join/FiltersQParser.java:49-61 (param filters as FILTER
               clauses + body as MUST; excludeTags drops tagged clauses)
switch         SwitchQParserPlugin.java:155-175 (case./default lookup)
query          NestedQParserPlugin (delegate to v)
frange         FunctionRangeQParserPlugin.java:45-67 →
               :class:`FunctionRangeQuery`
hash           HashQParserPlugin.java:70-74,212,265 →
               :class:`HashQuery`
graphTerms     GraphTermsQParserPlugin.java:88-154 →
               :class:`GraphTermsQuery`
maxscore       MaxScoreQParser.java:58-90 (SHOULD clauses regrouped
               into one DisjunctionMaxQuery(tie))
boost          BoostQParserPlugin ({!boost b=f}q → query(...)×f via the
               function-query compiler string)
dismax/edismax DisMax/ExtendedDismaxQParserPlugin → components
simple         SimpleQParserPlugin → parsers_extra.simple_parse
complexphrase  ComplexPhraseQParserPlugin → parsers_extra
surround       SurroundQParserPlugin → parsers_extra
xmlparser      XmlQParserPlugin → parsers_extra
=============  ==========================================================

The three new engine Query classes execute in
``search/executor.py::_compile``; their exact-arithmetic hash/range
contracts are documented on the classes.
"""

from __future__ import annotations

from dataclasses import dataclass

from .queries import (
    BooleanClause,
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermInSetQuery,
    TermQuery,
)


# ---------------------------------------------------------------------------
# Engine query classes for frange / hash / graphTerms
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """{!frange}: constant-score filter over a function query's value
    (FunctionRangeQParserPlugin.java:45-67 → ValueSourceRangeFilter;
    FunctionRangeQuery scores matching docs at the query boost like
    SolrConstantScoreQuery). ``func`` is a function-query string for
    :class:`~..search.function_queries.FunctionQueryCompiler`; ``l``/
    ``u`` of ``None`` leave that side unbounded
    (ValueSourceRangeFilter.java: null bound = open)."""

    func: str
    l: float | None = None  # noqa: E741 - Solr's param name
    u: float | None = None
    incl: bool = True
    incu: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class HashQuery(Query):
    """{!hash workers=N worker=i keys=f1,f2}: deterministic worker
    partition filter (HashQParserPlugin.java:78-140). Per doc the key
    hash is the SUM of per-field hashes (CompositeHash.hashCode :368),
    where a string field hashes with Java ``String.hashCode`` over its
    readable value (BytesHash :292-305 → CharsRef.hashCode, missing
    value = empty string = 0) and a numeric field with
    ``Longs.hashCode`` = ``(int)(l ^ (l >>> 32))`` (NumericHash
    :321-333, missing = 0). A doc matches worker ``i`` iff
    ``(hash & 0x7FFFFFFF) % workers == i`` (SegmentPartitioner :212 /
    HashCollector :265). Matching docs score at the boost (the
    reference uses it as a PostFilter; constant-score here).

    String hashing is exact for ASCII/Latin-1 values (the polynomial
    runs over UTF-16 code units; the Spark rendering uses per-char
    code points, identical below U+0800 surrogate-free text)."""

    keys: tuple[str, ...]
    workers: int
    worker: int
    boost: float = 1.0


@dataclass(frozen=True)
class FieldJoinQuery(Query):
    """{!join from=a to=b}subquery (JoinQParserPlugin /
    join/JoinUtil.createJoinQuery with ScoreMode.None): match docs
    whose ``to_field`` value appears among the ``from_field`` values
    of docs matching ``query``; constant score (Solr's {!join} carries
    no scores). Executed as two semi-joins over the docs table —
    the global-ordinals join's relational rendering."""

    from_field: str
    to_field: str
    query: Query
    boost: float = 1.0


@dataclass(frozen=True)
class GraphTermsQuery(Query):
    """{!graphTerms f=x maxDocFreq=N}t1,t2: constant-score disjunction
    over the subset of ``terms`` whose docFreq <= max_doc_freq
    (GraphTermsQParserPlugin.java:88-154 — the frequency gate at :262
    ``ts.docFreq() <= this.maxDocFreq``; the whole query is wrapped in
    ConstantScoreQuery at :154)."""

    terms: tuple[str, ...]
    max_doc_freq: int
    boost: float = 1.0
    field: str = "content"


# ---------------------------------------------------------------------------
# Local-params grammar
# ---------------------------------------------------------------------------
class SyntaxError_(ValueError):
    """Solr SyntaxError analogue."""


def parse_local_params(
    qstr: str, params: dict | None = None
) -> tuple[str, dict[str, list[str]], str]:
    """``{!type a=1 b='x y' v=$q}rest`` → ("type", {a:["1"],...}, body).

    Returns ("lucene", {}, qstr) when the string carries no local
    params. Repeated keys accumulate (SolrParams.getParams). ``$name``
    values dereference ``params`` (a str or list value). The ``v``
    local param replaces the trailing body (QueryParsing.V)."""
    params = params or {}
    s = qstr.strip()
    if not s.startswith("{!"):
        return "lucene", {}, qstr
    i, n = 2, len(s)
    ptype = None
    local: dict[str, list[str]] = {}

    def skip_ws(j):
        while j < n and s[j].isspace():
            j += 1
        return j

    def read_value(j):
        if j < n and s[j] in "'\"":
            quote, j = s[j], j + 1
            out = []
            while j < n and s[j] != quote:
                if s[j] == "\\" and j + 1 < n:
                    j += 1
                out.append(s[j])
                j += 1
            if j >= n:
                raise SyntaxError_(f"unterminated quote in {qstr!r}")
            return "".join(out), j + 1
        k = j
        while k < n and not s[k].isspace() and s[k] != "}":
            k += 1
        return s[j:k], k

    while True:
        i = skip_ws(i)
        if i >= n:
            raise SyntaxError_(f"missing }} in {qstr!r}")
        if s[i] == "}":
            i += 1
            break
        # read a token up to = / ws / }
        k = i
        while k < n and s[k] not in "= \t}'\"":
            k += 1
        tok = s[i:k]
        if k < n and s[k] == "=":
            val, i = read_value(k + 1)
            if val.startswith("$"):
                ref = params.get(val[1:])
                vals = ([] if ref is None
                        else list(ref) if isinstance(ref, (list, tuple))
                        else [str(ref)])
            else:
                vals = [val]
            local.setdefault(tok, []).extend(vals)
        else:
            # bare token = parser type (QueryParsing TYPE position)
            if ptype is None and tok:
                ptype = tok
            i = k
    body = s[i:].strip()
    if "v" in local:
        body = local["v"][0]
    return ptype or "lucene", local, body


def _get(local: dict, key: str, default=None):
    v = local.get(key)
    return v[0] if v else default


def _get_bool(local: dict, key: str, default: bool) -> bool:
    v = _get(local, key)
    return default if v is None else v.lower() in ("true", "1", "yes")


# ---------------------------------------------------------------------------
# Parser registry
# ---------------------------------------------------------------------------
def _p_lucene(local, body, params):
    from .parser import QueryParser

    df = _get(local, "df", "content")
    # Solr's q.op local param (LuceneQParser/QueryParsing: the
    # default operator override, e.g. {!lucene q.op=AND df=text})
    q_op = str(_get(local, "q.op", "OR")).upper()
    if q_op not in ("AND", "OR"):
        raise SyntaxError_(f"q.op must be AND or OR, got {q_op!r}")
    return QueryParser(default_field=df, default_operator=q_op).parse(body)


def _p_field(local, body, params):
    from ..analysis.tokenizer import StandardAnalyzer

    f = _get(local, "f", "content")
    terms, positions = StandardAnalyzer().analyze(body)
    if not terms:
        from .queries import MatchNoDocsQuery

        return MatchNoDocsQuery()
    if len(terms) == 1:
        return TermQuery(terms[0], field=f)
    return PhraseQuery(tuple(terms), tuple(positions), field=f)


def _p_raw(local, body, params):
    # RawQParserPlugin / TermQParserPlugin: no analysis at all
    return TermQuery(body, field=_get(local, "f", "content"))


def _p_prefix(local, body, params):
    return PrefixQuery(body, field=_get(local, "f", "content"))


def _p_terms(local, body, params):
    sep = _get(local, "separator", ",")
    vals = tuple(t.strip() for t in body.split(sep) if t.strip())
    return TermInSetQuery(vals, field=_get(local, "f", "content"))


def _p_bool(local, body, params):
    clauses = []
    for key, occur in (("must", "MUST"), ("must_not", "MUST_NOT"),
                       ("filter", "FILTER"), ("should", "SHOULD")):
        for sub in local.get(key, []):
            clauses.append(BooleanClause(qparse(sub, params), occur))
    return BooleanQuery(tuple(clauses))


def _p_filters(local, body, params):
    exclude = {t.strip()
               for t in _get(local, "excludeTags", "").split(",") if t.strip()}
    clauses = []
    if body:
        clauses.append(BooleanClause(qparse(body, params), "MUST"))
    for sub in local.get("param", []):
        _t, sub_local, _b = parse_local_params(sub, params)
        tags = {t.strip() for t in _get(sub_local, "tag", "").split(",")
                if t.strip()}
        if tags & exclude:
            continue
        clauses.append(BooleanClause(qparse(sub, params), "FILTER"))
    if not clauses:
        return MatchAllDocsQuery()  # noClausesQuery (FiltersQParser.java:68)
    return BooleanQuery(tuple(clauses))


def _p_switch(local, body, params):
    val = body.strip()
    sub = (_get(local, "case", _get(local, "default")) if not val
           else _get(local, f"case.{val}", _get(local, "default")))
    if sub is None:
        raise SyntaxError_(
            f"no default, and no switch case matching {val!r}")
    return qparse(sub, params)


def _p_query(local, body, params):
    return qparse(body, params)


def _p_frange(local, body, params):
    def num(x):
        return None if x is None else float(x)

    return FunctionRangeQuery(
        body,
        l=num(_get(local, "l")), u=num(_get(local, "u")),
        incl=_get_bool(local, "incl", True),
        incu=_get_bool(local, "incu", True))


def _p_hash(local, body, params):
    keys = tuple(k.strip()
                 for k in _get(local, "keys", "").split(",") if k.strip())
    if not keys:
        raise SyntaxError_("{!hash} requires keys")
    workers = int(_get(local, "workers", "0"))
    worker = int(_get(local, "worker", "0"))
    if workers <= 0 or not (0 <= worker < workers):
        raise SyntaxError_(
            f"{{!hash}} needs workers >= 1 and 0 <= worker < workers, "
            f"got workers={workers} worker={worker}")
    return HashQuery(keys, workers, worker)


def _p_join(local, body, params):
    f, t = _get(local, "from"), _get(local, "to")
    if not f or not t:
        raise SyntaxError_("{!join} requires from= and to=")
    return FieldJoinQuery(f, t, qparse(body, params))


def _p_graph_terms(local, body, params):
    terms = tuple(t.strip() for t in body.split(",") if t.strip())
    return GraphTermsQuery(
        terms, int(_get(local, "maxDocFreq", str(2**31 - 1))),
        field=_get(local, "f", "content"))


def _p_maxscore(local, body, params):
    """MaxScoreQParser.java:58-90: parse with the classic grammar, then
    regroup top-level SHOULD clauses into one DisjunctionMaxQuery(tie)
    added as a single SHOULD clause; other clauses pass through."""
    tie = float(_get(local, "tie", "0.0"))
    q = _p_lucene(local, body, params)
    if not isinstance(q, BooleanQuery):
        return q
    should = [c.query for c in q.clauses if c.occur == "SHOULD"]
    rest = [c for c in q.clauses if c.occur != "SHOULD"]
    if not should:
        return q
    rest.append(BooleanClause(
        DisjunctionMaxQuery(tuple(should), tie_breaker=tie), "SHOULD"))
    return BooleanQuery(tuple(rest), q.minimum_should_match, q.boost)


def _p_boost(local, body, params):
    """BoostQParserPlugin: {!boost b=func}q → score(q) × func. Lowered
    to the function-query string ``product(query("..."), b)`` which the
    FunctionQueryCompiler executes (QueryValueSource × the boost
    source), matching BoostedQuery = query score times function."""
    b = _get(local, "b", "1")
    sub = qparse(body, params)
    return FunctionBoostQuery(sub, b)


@dataclass(frozen=True)
class FunctionBoostQuery(Query):
    """BoostQParserPlugin/BoostedQuery role: ``query`` score × the
    function ``func`` value per doc (queries/function/BoostedQuery.java
    score = qscore * boost value). Matches only docs the query
    matches."""

    query: Query
    func: str
    boost: float = 1.0


def _p_dismax(local, body, params):
    from .components import edismax_query

    qf = {}
    for spec in _get(local, "qf", "content").split():
        if "^" in spec:
            f, b = spec.split("^", 1)
            qf[f] = float(b)
        else:
            qf[spec] = 1.0
    return edismax_query(
        body, qf,
        tie=float(_get(local, "tie", "0.0")),
        minimum_should_match=_get(local, "mm", 0) or 0)


def _p_simple(local, body, params):
    from .parsers_extra import SimpleQueryParser

    return SimpleQueryParser(
        default_field=_get(local, "df", "content")).parse(body)


def _p_surround(local, body, params):
    from .parsers_extra import SurroundQueryParser

    return SurroundQueryParser(
        default_field=_get(local, "df", "content")).parse(body)


def _p_xml(local, body, params):
    from .parsers_extra import XmlQueryParser

    return XmlQueryParser().parse(body)


QPARSERS = {
    "lucene": _p_lucene,
    "field": _p_field,
    "raw": _p_raw,
    "term": _p_raw,
    "prefix": _p_prefix,
    "terms": _p_terms,
    "bool": _p_bool,
    "filters": _p_filters,
    "switch": _p_switch,
    "query": _p_query,  # NestedQParserPlugin.NAME
    "frange": _p_frange,
    "hash": _p_hash,
    "join": _p_join,
    "graphTerms": _p_graph_terms,
    "maxscore": _p_maxscore,
    "boost": _p_boost,
    "dismax": _p_dismax,
    "edismax": _p_dismax,
    "simple": _p_simple,
    "surround": _p_surround,
    "xmlparser": _p_xml,
    # complexphrase needs a dictionary to expand wildcards-in-phrases
    # against; use parsers_extra.ComplexPhraseQueryParser with a
    # searcher-bound expand callable directly.
}


def qparse(qstr: str, params: dict | None = None) -> Query:
    """Parse a Solr query string with optional local params into an
    engine Query (QParser.getParser + subQuery dispatch)."""
    ptype, local, body = parse_local_params(qstr, params)
    try:
        fn = QPARSERS[ptype]
    except KeyError:
        raise SyntaxError_(f"unknown query parser {ptype!r}") from None
    return fn(local, body, params or {})
