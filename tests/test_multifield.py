"""Multi-field indexing + per-field scoring + edismax: Spark engine vs
oracle rank/score identity (FieldInfo.java:31-71 per-field stats,
ExtendedDismaxQParser.java role; VERDICT round-1 missing #1)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.components import edismax_query
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.parser import QueryParser
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FieldExistsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

N_DOCS = 100


def _title_expr(lang, path):
    # a few tokens, varies per doc, includes stopword + shared words
    return f"{lang} file of {path.split('/')[-1].split('.')[0]}"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_mf"))
    corpus = corpus_df(spark, N_DOCS, partitions=4).withColumn(
        "title",
        F.concat_ws(" ", F.col("lang"), F.lit("file"), F.lit("of"),
                    F.element_at(F.split(F.element_at(
                        F.split(F.col("path"), "/"), -1), "\\."), 1)),
    )
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8, fields=("title", "content"))
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    docs = []
    for _, r in pdf.iterrows():
        docs.append({"title": _title_expr(r["lang"], r["path"]),
                     "content": r["content"]})
    oracle.add_all(docs)
    return searcher, oracle


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


def test_per_field_term_scoring(built):
    searcher, oracle = built
    # title-field term: per-field df/avgdl/norms differ from content's
    _identical(searcher, oracle, TermQuery("python", field="title"))
    _identical(searcher, oracle, TermQuery("java", field="title"))
    # same term text via content field scores differently (or empty)
    _identical(searcher, oracle, TermQuery("python", field="content"))
    # cross-field boolean
    q = BooleanQuery.of(should=[TermQuery("python", field="title"),
                                TermQuery("return", field="content")])
    _identical(searcher, oracle, q)


def test_field_stats_differ(built):
    searcher, oracle = built
    assert searcher.field_stats["title"]["sum_ttf"] != \
        searcher.field_stats["content"]["sum_ttf"]
    assert oracle.field_sum_ttf["title"] == \
        searcher.field_stats["title"]["sum_ttf"]
    assert oracle.field_doc_count["title"] == \
        searcher.field_stats["title"]["doc_count"]


def test_title_phrase_and_prefix(built):
    searcher, oracle = built
    # "python file" adjacent in titles (stopword 'of' leaves a gap after)
    _identical(searcher, oracle, PhraseQuery(("python", "file"), field="title"))
    _identical(searcher, oracle,
               PrefixQuery("jav", rewrite="scoring_boolean", field="title"))


def test_field_exists(built):
    searcher, oracle = built
    got = searcher.search(FieldExistsQuery("title"), None if False else 200)
    exp = oracle.search(FieldExistsQuery("title"), 200)
    assert [(h.docid,) for h in got] == [(h.docid,) for h in exp]
    assert len(got) == N_DOCS
    assert searcher.search(FieldExistsQuery("nosuchfield"), 10) == []


def test_edismax_identity(built):
    searcher, oracle = built
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    q = edismax_query("python return", {"title": 2.0, "content": 1.0},
                      tie=0.3, analyzer=an)
    _identical(searcher, oracle, q)
    q2 = edismax_query("+java scan", {"title": 1.5, "content": 1.0},
                       analyzer=an)
    _identical(searcher, oracle, q2)


def test_dismax_cross_field(built):
    searcher, oracle = built
    q = DisjunctionMaxQuery(
        (TermQuery("python", boost=2.0, field="title"),
         TermQuery("python", field="content")),
        tie_breaker=0.1)
    _identical(searcher, oracle, q)


def test_parser_field_syntax(built):
    searcher, oracle = built
    p = QueryParser(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
                    fields=("content", "title"))
    q = p.parse("title:python AND return")
    _identical(searcher, oracle, q)


def test_edismax_phrase_boost_identity(built):
    """pf/pf2 boosts: matching unchanged, proximity rewarded, engine
    and oracle bit-identical on the boosted AST."""
    searcher, oracle = built
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    kw = dict(tie=0.3, analyzer=an)
    q_nopf = edismax_query("python file", {"title": 2.0, "content": 1.0}, **kw)
    q_pf = edismax_query(
        "python file", {"title": 2.0, "content": 1.0},
        pf={"title": 3.0}, pf2={"title": 1.5, "content": 0.5}, ps=1, **kw)
    _identical(searcher, oracle, q_pf)
    base = {d.docid: d.score for d in oracle.search(q_nopf, N_DOCS)}
    boosted = {d.docid: d.score for d in oracle.search(q_pf, N_DOCS)}
    assert set(boosted) == set(base)          # SHOULD boost can't change matching
    assert any(boosted[d] > base[d] + 1e-6 for d in boosted)  # proximity rewarded
    assert all(boosted[d] >= base[d] - 1e-6 for d in boosted)


def test_edismax_pf3_and_single_word(built):
    searcher, oracle = built
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    # trigram boost over a 3-bare-word query (stopword 'of' drops out
    # of the phrase shingles like the reference's analyzed pf phrases)
    q = edismax_query("python file of scan", {"title": 2.0, "content": 1.0},
                      analyzer=an, pf3={"title": 2.0}, ps3=1)
    _identical(searcher, oracle, q)
    # single bare word: no phrase boost fires, AST is the plain edismax
    q1 = edismax_query("python", {"title": 2.0, "content": 1.0},
                       analyzer=an, pf={"title": 3.0}, pf2={"title": 1.0})
    _identical(searcher, oracle, q1)


def test_blended_term_cross_field_dismax(built):
    """BlendedTermQuery (BlendedTermQuery.java:48-296): same word in
    two fields scores with blended stats (df = max, ttf = sum) under
    the default DisjunctionMax(tie=0.01) rewrite — engine/oracle
    identity."""
    from lucene_solr_spark.search.queries import BlendedTermQuery

    searcher, oracle = built
    q = BlendedTermQuery((("title", "python", 1.0),
                          ("content", "python", 1.0)))
    _identical(searcher, oracle, q, 15)


def test_blended_term_boolean_rewrite_and_boosts(built):
    from lucene_solr_spark.search.queries import BlendedTermQuery

    searcher, oracle = built
    q = BlendedTermQuery((("title", "java", 2.0),
                          ("content", "java", 1.0)),
                         rewrite_method="boolean", boost=1.5)
    _identical(searcher, oracle, q, 15)


def test_blended_df_is_max_across_members(built):
    """The blended df really is the max: a rare term blended with a
    common one scores with the common term's df (lower idf than it
    would alone)."""
    from lucene_solr_spark.search.queries import (
        BlendedTermQuery, DisjunctionMaxQuery)

    searcher, oracle = built
    blended = BlendedTermQuery((("title", "python", 1.0),
                                ("content", "return", 1.0)))
    rewritten = searcher.rewrite(blended)
    assert isinstance(rewritten, DisjunctionMaxQuery)
    df_title = oracle.doc_freq("python", "title")
    df_content = oracle.doc_freq("return", "content")
    assert df_title != df_content  # the blend is non-trivial
    assert {l.df for l in rewritten.disjuncts} == {max(df_title, df_content)}
    _identical(searcher, oracle, blended, 15)


# ---- FieldMaskingSpanQuery: cross-field span composition ------------------

def test_field_masking_span(built):
    """spans/FieldMaskingSpanQuery.java: a SpanNear across title and
    content positions — the masked clause enumerates ITS OWN field's
    positions, the tree reports (and scores with the norms of) the
    top field."""
    from lucene_solr_spark.search.spans import (
        FieldMaskingSpanQuery,
        SpanNearQuery,
        SpanOrQuery,
        SpanTermQuery,
    )

    searcher, oracle = built
    # title tokens: "<lang> file <name>" — positions 0..2 after the
    # "of" stopword drops; content has its own token stream
    title_term = SpanTermQuery("file", field="title")
    content_terms = sorted(t for f, t in oracle.postings
                           if f == "content")
    hot = max(content_terms,
              key=lambda t: len(oracle.postings[("content", t)]))
    masked = FieldMaskingSpanQuery(
        SpanTermQuery(hot, field="content"), "title")
    # ORDERED near over parallel position spaces (the javadoc's
    # teacher/student pattern): title position then a later content
    # position. Ordered keeps widths non-negative — coincident
    # positions across parallel fields make unordered width -1, where
    # the reference's computeSlopFactor divides by zero (degenerate in
    # Lucene too, javadoc :66-68's scoring caveat).
    q = SpanNearQuery((title_term, masked), slop=30, in_order=True,
                      field="title")
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert exp, "cross-field span should match the corpus"
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]

    # masking inside an Or as well
    q2 = SpanOrQuery((title_term, masked), field="title")
    exp2 = oracle.search(q2, 10)
    got2 = searcher.search(q2, 10)
    assert [(d.docid, np.float32(d.score)) for d in got2] == [
        (d.docid, np.float32(d.score)) for d in exp2]


def test_field_masking_enumeration_unit():
    import numpy as np

    from lucene_solr_spark.search.spans import (
        FieldMaskingSpanQuery,
        SpanNearQuery,
        SpanTermQuery,
        enumerate_spans,
        span_field_terms,
    )

    pos = {("a_field", "x"): np.array([0, 4]),
           ("b_field", "y"): np.array([1])}
    qx = SpanTermQuery("x", field="a_field")
    qy = FieldMaskingSpanQuery(SpanTermQuery("y", field="b_field"),
                               "a_field")
    near = SpanNearQuery((qx, qy), slop=0, field="a_field")
    assert enumerate_spans(near, pos) == [(0, 2, 0)]
    assert span_field_terms(near) == {("a_field", "x"), ("b_field", "y")}


# ---- per-field similarity (PerFieldSimilarityWrapper) ---------------------

def _title_docs(pdf):
    return [{"title": _title_expr(r["lang"], r["path"]),
             "content": r["content"]} for _, r in pdf.iterrows()]


def test_per_field_similarity(spark, tmp_path_factory):
    """search/similarities/PerFieldSimilarityWrapper.java — dict spec
    {field: similarity, "*": default}: title scores with Classic
    TF-IDF while content stays BM25, engine vs oracle identical under
    the same spec; single-field queries must equal a searcher built
    wholly with that field's similarity."""
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("index_pfs"))
    corpus = corpus_df(spark, 60, partitions=2).withColumn(
        "title",
        F.concat_ws(" ", F.col("lang"), F.lit("file"), F.lit("of"),
                    F.element_at(F.split(F.element_at(
                        F.split(F.col("path"), "/"), -1), "\\."), 1)))
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8, fields=("title", "content"))
    spec = {"title": "classic", "*": "bm25"}
    searcher = IndexSearcher(tables, cache=True, similarity=spec)
    pdf = (corpus_pandas(60)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        similarity=spec)
    oracle.add_all(_title_docs(pdf))

    _identical(searcher, oracle, TermQuery("file", field="title"))
    _identical(searcher, oracle, TermQuery("return", field="content"))
    _identical(searcher, oracle, DisjunctionMaxQuery(
        (TermQuery("file", field="title"),
         TermQuery("return", field="content")), tie_breaker=0.3))

    # the title leg must match a purely-classic searcher's scores
    classic = IndexSearcher(tables, cache=False, similarity="classic")
    a = searcher.search(TermQuery("file", field="title"), 10)
    b = classic.search(TermQuery("file", field="title"), 10)
    assert [(d.docid, np.float32(d.score)) for d in a] == [
        (d.docid, np.float32(d.score)) for d in b]
    # and the content leg a purely-bm25 searcher's
    bm = IndexSearcher(tables, cache=False, similarity="bm25")
    a = searcher.search(TermQuery("return", field="content"), 10)
    b = bm.search(TermQuery("return", field="content"), 10)
    assert [(d.docid, np.float32(d.score)) for d in a] == [
        (d.docid, np.float32(d.score)) for d in b]
