"""Pluggable analyzer on the distributed build path (§2.12 custom
Analyzer extension point): build_index(analyzer=...) must produce an
index whose searches are bit-identical to the pure-Python OracleIndex
running the SAME analyzer — including stemming, stop gaps in phrase
positions, and CJK bigrams."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, CJKAnalyzer
from lucene_solr_spark.analysis.filters import (
    CustomAnalyzer,
    porter_stem_filter,
    stop_filter,
)
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery

DOCS = [
    "the runner was running a long race",
    "running tests is the best of habits",
    "a racer raced the running races",
    "nothing related here at all",
    "long races need long running sessions",
]


def _mk_corpus(spark, texts):
    rows = [(f"r{i:03d}", f"p/{i:03d}.txt", str(i), "en", t)
            for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")


def _identical(searcher, oracle, q, k=10):
    got = searcher.search(q, k)
    exp = oracle.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


@pytest.fixture(scope="module")
def stemmed(spark, tmp_path_factory):
    an = CustomAnalyzer([stop_filter(ENGLISH_STOP_WORDS), porter_stem_filter])
    root = str(tmp_path_factory.mktemp("idx_custom_an"))
    tables = build_index(_mk_corpus(spark, DOCS), root, analyzer=an,
                         n_buckets=4, build_partitions=2)
    searcher = IndexSearcher(tables, cache=True)
    oracle = OracleIndex(analyzer=an)
    for t in DOCS:
        oracle.add(t)
    return searcher, oracle, an


def test_stemmed_term_identity(stemmed):
    searcher, oracle, an = stemmed
    # query side analyzes with the same chain: "running" → "run"
    qterms, _ = an.analyze("running")
    assert qterms == ["run"]
    _identical(searcher, oracle, TermQuery(qterms[0]))
    _identical(searcher, oracle, BooleanQuery.of(
        should=[TermQuery("race"), TermQuery("run")]))


def test_stop_gap_survives_into_phrase(stemmed):
    searcher, oracle, an = stemmed
    # "running a long race": 'a' is stop-filtered leaving a position
    # gap → "run long" is NOT adjacent, "long race" IS (positions 3,4
    # wait — gap at 'a'), verify engine agrees with oracle exactly
    _identical(searcher, oracle, PhraseQuery(("long", "race")))
    _identical(searcher, oracle, PhraseQuery(("run", "long")))
    # slop-2 version bridges the gap — identity again
    _identical(searcher, oracle, PhraseQuery(("run", "long"), slop=2))


def test_cjk_analyzer_on_build_path(spark, tmp_path_factory):
    an = CJKAnalyzer()
    texts = ["全文検索エンジン", "検索 は楽しい", "ﾃﾞｰﾀベース管理", "plain english only"]
    root = str(tmp_path_factory.mktemp("idx_cjk_an"))
    tables = build_index(_mk_corpus(spark, texts), root, analyzer=an,
                         n_buckets=4, build_partitions=2)
    searcher = IndexSearcher(tables, cache=True)
    oracle = OracleIndex(analyzer=an)
    for t in texts:
        oracle.add(t)
    qterms, _ = an.analyze("検索")
    q = BooleanQuery.of(must=[TermQuery(t) for t in qterms])
    _identical(searcher, oracle, q)
    # width folding unifies halfwidth ﾃﾞｰﾀ with fullwidth データ query
    qterms2, _ = an.analyze("データ")
    q2 = BooleanQuery.of(must=[TermQuery(t) for t in qterms2])
    got = searcher.search(q2, 10)
    assert [h.docid for h in got] == [2]
    _identical(searcher, oracle, q2)


def test_sha_invariant_kept_on_analyzer_path(stemmed, spark):
    searcher, _oracle, _an = stemmed
    import hashlib
    rows = {r["docid"]: r["content_sha256"]
            for r in searcher.docs.select("docid", "content_sha256").collect()}
    for i, t in enumerate(DOCS):
        assert rows[i] == hashlib.sha256(t.encode()).hexdigest()


def test_per_field_analyzers(spark, tmp_path_factory):
    """{field: analyzer} dict = PerFieldAnalyzerWrapper / Solr schema
    fieldType: stemmed content, raw-keyword title."""
    from lucene_solr_spark.analysis.tokenizer import keyword_tokenize

    an_content = CustomAnalyzer([porter_stem_filter])
    an_title = CustomAnalyzer(tokenizer=keyword_tokenize)
    rows = [("r0", "p0", "0", "en", "running races", "My Exact Title"),
            ("r1", "p1", "1", "en", "racing runs", "Another One")]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string,"
              " content string, title string")
    root = str(tmp_path_factory.mktemp("idx_perfield_an"))
    tables = build_index(corpus, root,
                         analyzer={"content": an_content, "title": an_title},
                         fields=("content", "title"), n_buckets=2,
                         build_partitions=1)
    searcher = IndexSearcher(tables, cache=True)
    # content stemmed: "races"→"race" (doc 0) and "racing"→"race" (doc 1)
    assert sorted(h.docid for h in searcher.search(TermQuery("race"), 5)) == [0, 1]
    # title kept whole (keyword tokenizer, lowercased by CustomAnalyzer)
    assert [h.docid for h in
            searcher.search(TermQuery("my exact title", field="title"), 5)] == [0]


def test_query_parser_per_field_analyzers():
    """QueryParser(field_analyzers={...}): field:term analyzes with that
    field's chain (QueryParserBase.getFieldQuery via the field analyzer)."""
    from lucene_solr_spark.analysis import StandardAnalyzer
    from lucene_solr_spark.search.parser import QueryParser

    stem = CustomAnalyzer([porter_stem_filter])
    p = QueryParser(analyzer=StandardAnalyzer(),
                    fields=("content", "title"),
                    field_analyzers={"content": stem})
    q = p.parse("content:running")
    assert isinstance(q, TermQuery) and q.term == "run"
    q2 = p.parse("title:running")
    assert isinstance(q2, TermQuery) and q2.term == "running"
    # phrases route through the field analyzer too
    q3 = p.parse('content:"running races"')
    assert isinstance(q3, PhraseQuery) and tuple(q3.terms) == ("run", "race")
