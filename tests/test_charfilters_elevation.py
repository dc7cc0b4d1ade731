"""Char filters (HTMLStrip/Mapping/PatternReplace roles) — Python and
Spark twins must agree — and the QueryElevationComponent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.analysis.charfilters import (
    html_strip,
    html_strip_column,
    mapping_char_filter,
    mapping_char_filter_column,
    pattern_replace_char_filter,
    pattern_replace_char_filter_column,
)
from lucene_solr_spark.analysis.filters import CustomAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

N_DOCS = 100

HTML_SAMPLES = [
    "<p>my <b>test</b> html</p>",
    "a<br/>b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39;",
    "<script>var x = '<p>no</p>';</script>keep <!-- drop me --> this",
    "<STYLE type='x'>h1 { color: red }</STYLE>visible",
    "plain text, no markup",
    "",
]


def test_html_strip_python():
    assert html_strip(HTML_SAMPLES[0]) == "my test html"
    assert html_strip(HTML_SAMPLES[1]) == "a b & c <tag> \"q\" 's'"
    assert html_strip(HTML_SAMPLES[2]) == "keep this"
    assert html_strip(HTML_SAMPLES[3]) == "visible"
    assert html_strip(HTML_SAMPLES[4]) == "plain text, no markup"
    # tags create token boundaries: no gluing across removed markup
    assert html_strip("<p>a</p><p>b</p>") == "a b"


def test_html_strip_spark_twin(spark):
    df = spark.createDataFrame([(s,) for s in HTML_SAMPLES], "raw string")
    got = [r["out"] for r in
           df.select(html_strip_column(F.col("raw")).alias("out")).collect()]
    assert got == [html_strip(s) for s in HTML_SAMPLES]


def test_mapping_char_filter_longest_match():
    f = mapping_char_filter({"ph": "f", "p": "b", "qu": "q"})
    # "ph" wins over "p" (longest match), multiple hits rewrite all
    assert f("photograph quip") == "fotograf qib"
    assert mapping_char_filter({})("same") == "same"


def test_mapping_char_filter_spark_twin(spark):
    m = {"ph": "f", "p": "b", "qu": "q"}
    f = mapping_char_filter(m)
    texts = ["photograph quip", "pp phph", "", "none here"]
    df = spark.createDataFrame([(s,) for s in texts], "raw string")
    got = [r["out"] for r in df.select(
        mapping_char_filter_column(F.col("raw"), m).alias("out")).collect()]
    assert got == [f(s) for s in texts]


def test_pattern_replace_twins(spark):
    f = pattern_replace_char_filter(r"\d+", "#")
    texts = ["a1b22c333", "no digits", ""]
    assert f(texts[0]) == "a#b#c#"
    df = spark.createDataFrame([(s,) for s in texts], "raw string")
    got = [r["out"] for r in df.select(
        pattern_replace_char_filter_column(
            F.col("raw"), r"\d+", "#").alias("out")).collect()]
    assert got == [f(s) for s in texts]


def test_custom_analyzer_char_filters():
    an = CustomAnalyzer(char_filters=[html_strip])
    assert an.terms("<p>Hello <b>World</b></p>") == ["hello", "world"]
    # char filter runs BEFORE tokenization: mapping can merge chars
    an2 = CustomAnalyzer(char_filters=[mapping_char_filter({"-": ""})])
    assert an2.terms("re-index") == ["reindex"]


# ---- QueryElevationComponent ---------------------------------------------


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_elev"))
    corpus = corpus_df(spark, N_DOCS, partitions=4).cache()
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


def _query(oracle):
    v = sorted((t for _f, t in oracle.postings),
               key=lambda t: -oracle.doc_freq(t))
    return BooleanQuery.of(should=[TermQuery(v[0]), TermQuery(v[1])])


def test_elevation_pins_and_excludes(built):
    searcher, oracle = built
    q = _query(oracle)
    organic = [d.docid for d in oracle.search(q, 20)]
    assert len(organic) >= 6
    # pin two NON-top docs (config order: second first), exclude the
    # organic #1
    pin = [organic[5], organic[3]]
    rows = C.elevate_topk(searcher, q, elevated=pin, k=10,
                          excluded=[organic[0]]).collect()
    got = [r["docid"] for r in rows]
    assert got[:2] == pin                      # config order, not score
    assert organic[0] not in got               # excluded
    assert all(r["elevated"] for r in rows[:2])
    assert not any(r["elevated"] for r in rows[2:])
    # organic remainder keeps engine order minus pinned/excluded
    rest_expected = [d for d in organic
                     if d not in pin and d != organic[0]]
    assert got[2:] == rest_expected[:len(got) - 2]


def test_elevation_includes_nonmatching_doc(built):
    searcher, oracle = built
    q = _query(oracle)
    matching = {d.docid for d in oracle.search(q, 10_000)}
    non_match = next(d for d in range(N_DOCS) if d not in matching)
    rows = C.elevate_topk(searcher, q, elevated=[non_match], k=5).collect()
    assert rows[0]["docid"] == non_match
    assert rows[0]["score"] is None            # pinned in, no organic score
    assert rows[0]["elevated"]


def test_elevation_empty_config_is_plain_topk(built):
    searcher, oracle = built
    q = _query(oracle)
    rows = C.elevate_topk(searcher, q, elevated=[], k=10).collect()
    organic = [d.docid for d in oracle.search(q, 10)]
    assert [r["docid"] for r in rows] == organic
