"""JSON Facet API compiler — expectations hand-computed with pandas
over the same inline frame."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.relational.jsonfacet import json_facet, to_buckets

ROWS = [
    # (lang, source, n_chars)
    ("en", "web", 100), ("en", "web", 200), ("en", "book", 300),
    ("en", "book", 150), ("en", "wiki", 50),
    ("de", "web", 400), ("de", "wiki", 120), ("de", "wiki", 80),
    ("fr", "book", 500),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "lang string, source string, n_chars long").cache()


def pdf():
    return pd.DataFrame(ROWS, columns=["lang", "source", "n_chars"])


def test_terms_with_aggs(docs):
    req = {"langs": {"type": "terms", "field": "lang", "limit": 2,
                     "facet": {"avg_len": "avg(n_chars)",
                               "srcs": "unique(source)"}}}
    got = {r["langs_val"]: r for r in json_facet(docs, req).collect()}
    # top-2 by count: en (5), de (3)
    assert set(got) == {"en", "de"}
    p = pdf()
    for lang in ("en", "de"):
        g = p[p.lang == lang]
        assert got[lang]["langs_count"] == len(g)
        assert got[lang]["avg_len"] == pytest.approx(g.n_chars.mean())
        assert got[lang]["srcs"] == g.source.nunique()


def test_terms_sort_by_agg_and_mincount(docs):
    req = {"langs": {"type": "terms", "field": "lang", "limit": 10,
                     "mincount": 2, "sort": "avg_len desc",
                     "facet": {"avg_len": "avg(n_chars)"}}}
    rows = json_facet(docs, req).collect()
    # fr dropped by mincount; de avg 200 > en avg 160
    assert [r["langs_val"] for r in rows] == ["de", "en"]


def test_nested_terms_per_parent_limit(docs):
    req = {"langs": {"type": "terms", "field": "lang", "limit": 2,
                     "facet": {
                         "srcs": {"type": "terms", "field": "source",
                                  "limit": 1}}}}
    rows = json_facet(docs, req).collect()
    got = {(r["langs_val"], r["srcs_val"]):
           (r["langs_count"], r["srcs_count"]) for r in rows}
    # en: top source = book/web tie at 2 → value tie-break picks book;
    # de: wiki (2)
    assert got == {("en", "book"): (5, 2), ("de", "wiki"): (3, 2)}


def test_range_facet(docs):
    req = {"len": {"type": "range", "field": "n_chars",
                   "start": 0, "end": 400, "gap": 200,
                   "facet": {"m": "max(n_chars)"}}}
    rows = {r["len_val"]: r for r in json_facet(docs, req).collect()}
    # [0,200): 100,150,50,120,80 → 5 docs max 150
    # [200,400): 200,300 → 2 docs max 300; 400,500 excluded (end)
    assert set(rows) == {0, 200}
    assert rows[0]["len_count"] == 5 and rows[0]["m"] == 150
    assert rows[200]["len_count"] == 2 and rows[200]["m"] == 300


def test_query_facet(docs):
    req = {"long_docs": {"type": "query", "q": "n_chars >= 300",
                         "facet": {"s": "sum(n_chars)"}}}
    rows = json_facet(docs, req).collect()
    assert len(rows) == 1
    assert rows[0]["long_docs_count"] == 3          # 300, 400, 500
    assert rows[0]["s"] == 1200


def test_multiple_top_level_facets_union(docs):
    req = {
        "langs": {"type": "terms", "field": "lang", "limit": 1},
        "srcs": {"type": "terms", "field": "source", "limit": 1},
    }
    rows = json_facet(docs, req).collect()
    vals = {(r["langs_val"], r["srcs_val"]) for r in rows}
    assert ("en", None) in vals
    # top source: web(3)/wiki(3)/book(3) all tie → value order: book
    assert (None, "book") in vals


def test_sibling_subfacets_rejected(docs):
    req = {"langs": {"type": "terms", "field": "lang",
                     "facet": {"a": {"type": "terms", "field": "source"},
                               "b": {"type": "terms", "field": "source"}}}}
    with pytest.raises(NotImplementedError):
        json_facet(docs, req)


def test_extended_agg_set(docs):
    req = {"all": {"type": "query", "q": "true",
                   "facet": {"p50": "percentile(n_chars, 50)",
                             "sq": "sumsq(n_chars)",
                             "sd": "stddev(n_chars)",
                             "cv": "countvals(n_chars)",
                             "miss": "missing(source)",
                             "h": "hll(source)"}}}
    r = json_facet(docs, req).collect()[0]
    p = pdf()
    assert r["p50"] == pytest.approx(p.n_chars.median())
    assert r["sq"] == (p.n_chars ** 2).sum()
    assert r["sd"] == pytest.approx(p.n_chars.std(ddof=1))
    assert r["cv"] == len(p)
    assert r["miss"] == 0
    assert r["h"] >= 1


def test_to_buckets_shape(docs):
    req = {"langs": {"type": "terms", "field": "lang", "limit": 3,
                     "facet": {"avg_len": "avg(n_chars)"}}}
    buckets = to_buckets(json_facet(docs, req).collect(), "langs")
    assert [b["val"] for b in buckets] == ["en", "de", "fr"]
    assert buckets[0]["count"] == 5
    assert "avg_len" in buckets[0]


# ---- domain changes (FacetProcessor.java:138-289) -------------------------

BLOCK_ROWS = [
    # (doc_type, _root_, prio, price, qty)
    ("parent", 1, "HIGH", 300.0, None),
    ("child",  1, None,   None,  10),
    ("child",  1, None,   None,  50),
    ("parent", 2, "LOW",  100.0, None),
    ("child",  2, None,   None,  50),
    ("parent", 3, "HIGH", 250.0, None),
    ("child",  3, None,   None,  5),
    ("parent", 4, "HIGH", 900.0, None),   # no children
]


@pytest.fixture(scope="module")
def blocks(spark):
    return spark.createDataFrame(
        BLOCK_ROWS,
        "doc_type string, _root_ long, prio string, price double, qty long"
    ).cache()


def test_domain_filter_only(blocks):
    req = {"p": {"type": "terms", "field": "prio",
                 "domain": {"filter": "price >= 250"}}}
    got = {r["p_val"]: r["p_count"] for r in
           json_facet(blocks, req).collect()}
    assert got == {"HIGH": 3}


def test_domain_block_parent(blocks):
    # children with qty >= 50 -> their parents, faceted by prio
    req = {"p": {"type": "terms", "field": "prio",
                 "domain": {"query": "doc_type = 'child' AND qty >= 50",
                            "blockParent": "doc_type = 'parent'"},
                 "facet": {"avg_price": "avg(price)"}}}
    got = {r["p_val"]: r for r in json_facet(blocks, req).collect()}
    # parents 1 and 2 have a qty>=50 child
    assert {k: v["p_count"] for k, v in got.items()} == {"HIGH": 1, "LOW": 1}
    assert got["HIGH"]["avg_price"] == 300.0
    assert got["LOW"]["avg_price"] == 100.0


def test_domain_block_children_with_accept_filter(blocks):
    # HIGH parents -> their children, filter = acceptDocs (qty > 5)
    req = {"q": {"type": "query", "q": "qty IS NOT NULL",
                 "domain": {"query": "doc_type = 'parent' AND prio = 'HIGH'",
                            "blockChildren": "doc_type = 'parent'",
                            "filter": "qty > 5"},
                 "facet": {"total_qty": "sum(qty)"}}}
    r = json_facet(blocks, req).collect()[0]
    # parent 1's children (10, 50); parent 3's child 5 filtered out;
    # parent 4 has none
    assert r["q_count"] == 2 and r["total_qty"] == 60


def test_domain_join(blocks, spark):
    # join domain: transfer from child qty values to parent _root_...
    # use from=_root_ to=_root_ restricted by query first
    req = {"p": {"type": "terms", "field": "prio",
                 "domain": {"query": "doc_type = 'child' AND qty = 50",
                            "join": {"from": "_root_", "to": "_root_"},
                            "filter": "doc_type = 'parent'"}}}
    got = {r["p_val"]: r["p_count"] for r in
           json_facet(blocks, req).collect()}
    assert got == {"HIGH": 1, "LOW": 1}


def test_domain_switch_below_root_rejected(blocks):
    req = {"p": {"type": "terms", "field": "prio",
                 "facet": {"c": {"type": "terms", "field": "doc_type",
                                 "domain": {"blockChildren":
                                            "doc_type = 'parent'"}}}}}
    with pytest.raises(NotImplementedError):
        json_facet(blocks, req)
