"""Solr JSON Request API — the JSON Query DSL.

Reference: ``solr/core/src/java/org/apache/solr/request/json/
JsonQueryConverter.java`` (the DSL-to-local-params translator used by
``RequestUtil.processParams``): a query is either

* a plain string — parsed by the default (lucene) parser, local-params
  syntax included (:40-44);
* ``{"param": "ref"}`` — dereference a request parameter (:55-60);
* a one-key object ``{"<parser>": <val>}`` — the key names a QParser,
  the value's properties become its local params, the ``query``
  property (or ``v``) is the body; nested query objects recurse
  (:62-116). A plain-string value is shorthand for the bare body.
* ``{"#tag": <query>}`` — a tagged query (:75-87). Tags exist for
  faceting's excludeTags; this port unwraps them (the relational
  layer's JSON facet compiler applies domain filters itself).

Every parser name dispatches into the SAME registry the string
local-params syntax uses (``qparser.QPARSERS``), so the two front ends
stay behaviorally identical by construction; ``bool`` / ``boost`` /
``frange`` / ``join`` accept nested query OBJECTS and are compiled
structurally here (the reference lowers them to ``$_tt<N>`` param
references — same effect, different plumbing).
"""

from __future__ import annotations

from .qparser import (
    QPARSERS,
    FieldJoinQuery,
    FunctionBoostQuery,
    FunctionRangeQuery,
    SyntaxError_,
    qparse,
)
from .queries import BooleanClause, BooleanQuery, Query

_NESTING = ("bool", "boost", "frange", "join")


def json_query(node, params: dict | None = None) -> Query:
    """Compile one JSON query DSL node into an engine Query."""
    params = params or {}
    if isinstance(node, str):
        return qparse(node, params)
    if not isinstance(node, dict):
        raise SyntaxError_(
            f"JSON query must be a string or object, got {type(node).__name__}")
    if len(node) != 1:
        raise SyntaxError_(
            f"JSON query object must have exactly one key, got {sorted(node)}")
    (name, val), = node.items()
    if name.startswith("#"):           # tagged query (:75-87)
        return json_query(val, params)
    if name == "param":                # parameter dereference (:55-60)
        try:
            return json_query(params[val], params)
        except KeyError:
            raise SyntaxError_(f"undefined parameter ${val}") from None

    if name == "bool":
        return _bool_query(val, params)
    if name == "boost":
        _require_obj(name, val)
        sub = _sub_query(name, val)
        return FunctionBoostQuery(sub, str(val.get("b", "1")))
    if name == "frange":
        _require_obj(name, val)
        body = val.get("query", val.get("v"))
        if not isinstance(body, str):
            raise SyntaxError_("frange needs a function-query string")

        def num(x):
            return None if x is None else float(x)

        return FunctionRangeQuery(
            body, l=num(val.get("l")), u=num(val.get("u")),
            incl=bool(val.get("incl", True)), incu=bool(val.get("incu", True)))
    if name == "join":
        _require_obj(name, val)
        if "from" not in val or "to" not in val:
            raise SyntaxError_("join requires from and to")
        return FieldJoinQuery(val["from"], val["to"],
                              _sub_query(name, val))

    # generic delegation: properties → local params, query/v → body
    try:
        fn = QPARSERS[name]
    except KeyError:
        raise SyntaxError_(f"unknown query parser {name!r}") from None
    if isinstance(val, str):
        local, body = {}, val
    elif isinstance(val, dict):
        # local params are multi-valued lists, as parse_local_params
        # produces them
        local = {k: ([_coerce(x) for x in v] if isinstance(v, list)
                     else [_coerce(v)])
                 for k, v in val.items() if k not in ("query", "v")}
        body = val.get("query", val.get("v", ""))
        if isinstance(body, dict):
            raise SyntaxError_(
                f"parser {name!r} takes a string body; nested query "
                f"objects are supported under {_NESTING}")
        body = "" if body is None else str(body)
    else:
        raise SyntaxError_(f"invalid value for parser {name!r}")
    return fn(local, body, params)


def _require_obj(name: str, val) -> None:
    if not isinstance(val, dict):
        raise SyntaxError_(f"{name} takes an object value")


def _sub_query(name: str, val: dict) -> Query:
    body = val.get("query", val.get("v"))
    if body is None:
        raise SyntaxError_(f"{name} requires a query")
    return json_query(body, {})


def _coerce(v):
    """Local-param values reach the string-oriented _p_* getters; JSON
    scalars render the way Solr's converter writes them."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    return v


def _bool_query(val, params: dict) -> Query:
    """BoolQParserPlugin through JSON: must/must_not/filter/should
    arrays (or single nodes) of nested queries."""
    _require_obj("bool", val)
    clauses = []
    for key, occur in (("must", "MUST"), ("must_not", "MUST_NOT"),
                       ("filter", "FILTER"), ("should", "SHOULD")):
        subs = val.get(key, [])
        if isinstance(subs, (str, dict)):
            subs = [subs]
        for sub in subs:
            clauses.append(BooleanClause(json_query(sub, params), occur))
    if not clauses:
        raise SyntaxError_("bool query requires at least one clause")
    return BooleanQuery(tuple(clauses))
