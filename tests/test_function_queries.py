"""Function-query compiler vs hand-computed values
(ValueSourceParser registry roles; queries/function/FunctionQuery.java
AllScorer = all-docs scoring)."""

import math

import numpy as np
import pytest

from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.function_queries import FunctionQueryCompiler

N_DOCS = 120


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fqidx"))
    tables = build_index(corpus_df(spark, N_DOCS, partitions=4), root)
    return IndexSearcher(tables, cache=True)


def _common_term(searcher):
    from pyspark.sql import functions as F

    return searcher.dict.orderBy(F.desc("df"), "term").limit(1).collect()[0]


def test_termfreq_matches_postings(spark, searcher):
    row = _common_term(searcher)
    t = row["term"]
    fq = FunctionQueryCompiler(searcher)
    got = {r["docid"]: r["score"]
           for r in fq.dataframe(f"termfreq(content,'{t}')").collect()}
    assert len(got) == N_DOCS  # AllScorer: every doc scored
    from pyspark.sql import functions as F

    exp = {r["docid"]: r["tf"] for r in
           searcher.postings.where(F.col("term") == t).collect()}
    for d, tf in exp.items():
        assert got[d] == tf
    assert sum(1 for v in got.values() if v == 0) == N_DOCS - len(exp)


def test_docfreq_and_idf_literals(spark, searcher):
    row = _common_term(searcher)
    t, df_ = row["term"], int(row["df"])
    fq = FunctionQueryCompiler(searcher)
    vals = {r["score"] for r in
            fq.dataframe(f"docfreq(content,'{t}')").collect()}
    assert vals == {df_}
    idf = sorted({r["score"] for r in
                  fq.dataframe(f"idf(content,'{t}')").collect()})
    exp_idf = float(np.float32(math.log(
        1 + (searcher.doc_count - df_ + 0.5) / (df_ + 0.5))))
    assert idf == [pytest.approx(exp_idf)]


def test_composed_arithmetic(spark, searcher):
    row = _common_term(searcher)
    t = row["term"]
    fq = FunctionQueryCompiler(searcher)
    got = {r["docid"]: r["score"] for r in fq.dataframe(
        f"sum(product(termfreq(content,'{t}'), 2), dl)").collect()}
    tfs = {r["docid"]: r["tf"] for r in
           fq.searcher.postings.where(
               fq.searcher.postings.term == t).collect()}
    dls = {r["docid"]: r["dl"] for r in
           searcher.docs.select("docid", "dl").collect()}
    for d in dls:
        assert got[d] == tfs.get(d, 0) * 2 + dls[d]


def test_if_exists_and_log(spark, searcher):
    row = _common_term(searcher)
    t = row["term"]
    fq = FunctionQueryCompiler(searcher)
    got = {r["docid"]: r["score"] for r in fq.dataframe(
        f"if(exists(field(dl)), log(100), 0)").collect()}
    assert sorted(set(got.values())) == [pytest.approx(2.0)]


def test_extended_parsers(searcher):
    """linear/recip/map/mod/ttf/sttf/maxdoc/scale/strdist
    (ValueSourceParser registry depth, round-3)."""
    c = FunctionQueryCompiler(searcher)
    rows = {r["docid"]: r["score"] for r in
            c.dataframe("linear(dl(content), 2, 1)").collect()}
    dls = {r["docid"]: r["dl"] for r in
           searcher.docs.select("docid", "dl").collect()}
    for d, s in rows.items():
        assert s == 2 * dls[d] + 1

    rows = {r["docid"]: r["score"] for r in
            c.dataframe("recip(dl(content), 1, 1000, 1000)").collect()}
    for d, s in rows.items():
        assert abs(s - 1000.0 / (dls[d] + 1000.0)) < 1e-9

    rows = {r["docid"]: r["score"] for r in
            c.dataframe("map(dl(content), 0, 50, 0)").collect()}
    for d, s in rows.items():
        assert s == (0 if dls[d] <= 50 else dls[d])

    one = c.dataframe("div(ttf(content, 'the'), sttf(content))").limit(1).collect()
    assert len(one) == 1

    md = c.dataframe("maxdoc()").limit(1).collect()[0]["score"]
    assert md == searcher.doc_count

    # scale: min -> 0, max -> 100
    rows = [r["score"] for r in
            c.dataframe("scale(dl(content), 0, 100)").collect()]
    assert min(rows) == 0.0 and max(rows) == 100.0
