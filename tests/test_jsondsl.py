"""Solr JSON Query DSL (request/json/JsonQueryConverter.java):
structural equivalence with the string local-params front end, nested
bool/boost/frange/join objects, param dereference, tag unwrap."""

import pytest

from lucene_solr_spark.search.jsondsl import json_query
from lucene_solr_spark.search.qparser import (
    FieldJoinQuery,
    FunctionBoostQuery,
    FunctionRangeQuery,
    SyntaxError_,
    qparse,
)
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    PrefixQuery,
    TermInSetQuery,
    TermQuery,
)


def test_plain_string_is_lucene():
    assert json_query("content:hello") == qparse("content:hello")
    # local-params syntax inside the string still works (:40-44)
    assert json_query("{!prefix f=content}hel") == PrefixQuery(
        "hel", field="content")


def test_generic_parser_object():
    q = json_query({"prefix": {"f": "content", "query": "hel"}})
    assert q == PrefixQuery("hel", field="content")
    # shorthand: plain-string value is the bare body
    assert json_query({"lucene": "content:hello"}) == qparse("content:hello")
    q = json_query({"terms": {"f": "lang", "query": "py,go"}})
    assert q == TermInSetQuery(("py", "go"), field="lang")


def test_front_ends_agree():
    # the same query through both front ends must compile identically
    js = json_query({"field": {"f": "content", "query": "hello world"}})
    ls = qparse("{!field f=content}hello world")
    assert js == ls


def test_bool_nesting():
    q = json_query({
        "bool": {
            "must": [{"field": {"f": "content", "query": "spark"}},
                     "content:engine"],
            "must_not": {"prefix": {"f": "content", "query": "jav"}},
            "filter": [{"frange": {"l": 0, "u": 10, "query": "dl()"}}],
            "should": "content:fast",
        }
    })
    assert isinstance(q, BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == ["MUST", "MUST", "MUST_NOT", "FILTER", "SHOULD"]
    assert isinstance(q.clauses[2].query, PrefixQuery)
    assert isinstance(q.clauses[3].query, FunctionRangeQuery)


def test_boost_and_join_nested_objects():
    q = json_query({"boost": {
        "b": "log(sum(dl(),1))",
        "query": {"field": {"f": "content", "query": "spark"}}}})
    assert isinstance(q, FunctionBoostQuery)
    assert isinstance(q.query, TermQuery)

    j = json_query({"join": {"from": "repo", "to": "repo",
                             "query": "content:spark"}})
    assert isinstance(j, FieldJoinQuery)
    assert j.from_field == "repo"


def test_param_dereference_and_tags():
    q = json_query({"param": "myq"}, params={"myq": "content:hello"})
    assert q == qparse("content:hello")
    with pytest.raises(SyntaxError_):
        json_query({"param": "missing"})
    # tagged queries unwrap (:75-87)
    t = json_query({"#mytag": {"prefix": {"f": "content", "query": "he"}}})
    assert t == PrefixQuery("he", field="content")


def test_errors():
    with pytest.raises(SyntaxError_):
        json_query(42)
    with pytest.raises(SyntaxError_):
        json_query({"prefix": {"f": "x"}, "lucene": "y"})  # two keys
    with pytest.raises(SyntaxError_):
        json_query({"nosuchparser": "x"})
    with pytest.raises(SyntaxError_):
        json_query({"bool": {}})
    with pytest.raises(SyntaxError_):
        # nested object under a string-body parser
        json_query({"prefix": {"f": "x", "query": {"lucene": "y"}}})


# ---- property: both front ends compile identically -------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)


@given(_word, _word, st.sampled_from(["prefix", "term", "field"]))
@settings(max_examples=80, deadline=None)
def test_front_end_equivalence_random(f_suffix, body, ptype):
    field = "content"
    js = json_query({ptype: {"f": field, "query": body}})
    ls = qparse(f"{{!{ptype} f={field}}}{body}")
    assert js == ls


@given(st.lists(_word, min_size=1, max_size=4),
       st.lists(_word, min_size=0, max_size=2))
@settings(max_examples=60, deadline=None)
def test_bool_front_end_equivalence(musts, nots):
    js = json_query({"bool": {
        "must": [{"term": {"f": "content", "query": w}} for w in musts],
        "must_not": [{"term": {"f": "content", "query": w}}
                     for w in nots]}})
    params = {}
    for i, w in enumerate(musts):
        params[f"m{i}"] = f"{{!term f=content}}{w}"
    for i, w in enumerate(nots):
        params[f"n{i}"] = f"{{!term f=content}}{w}"
    expr = ("{!bool "
            + " ".join(f"must=$m{i}" for i in range(len(musts)))
            + " "
            + " ".join(f"must_not=$n{i}" for i in range(len(nots)))
            + "}")
    ls = qparse(expr, params)
    assert js == ls
