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


def test_math_bool_comparison_parsers(searcher):
    """Math zoo + boolean/comparison + def (round-3 registry widening:
    ValueSourceParser's DoubleFunction / BoolFunction /
    ComparisonBoolFunction blocks)."""
    c = FunctionQueryCompiler(searcher)
    dls = {r["docid"]: r["dl"] for r in
           searcher.docs.select("docid", "dl").collect()}

    rows = {r["docid"]: r["score"] for r in
            c.dataframe("ceil(div(dl(content), 7))").collect()}
    for d, s in rows.items():
        assert s == math.ceil(dls[d] / 7)

    rows = {r["docid"]: r["score"] for r in
            c.dataframe("if(gt(dl(content), 50), 1, 0)").collect()}
    for d, s in rows.items():
        assert s == (1 if dls[d] > 50 else 0)

    rows = {r["docid"]: r["score"] for r in c.dataframe(
        "if(and(gte(dl(content), 0), not(eq(dl(content), -1))), 2, 3)"
    ).collect()}
    assert set(rows.values()) == {2}

    one = c.dataframe("def(field(dl), 7)").limit(1).collect()[0]["score"]
    assert one is not None

    v = c.dataframe("sum(atan2(1, 1), hypot(3, 4), pi())").limit(
        1).collect()[0]["score"]
    assert v == pytest.approx(math.atan2(1, 1) + 5.0 + math.pi)


def test_vector_and_geo_parsers(searcher):
    """dist/sqedist (VectorDistanceFunction) and geodist
    (HaversineConstFunction)."""
    c = FunctionQueryCompiler(searcher)
    get1 = lambda e: c.dataframe(e).limit(1).collect()[0]["score"]
    assert get1("sqedist(1, 2, 4, 6)") == 25.0
    assert get1("dist(2, 1, 2, 4, 6)") == pytest.approx(5.0)
    assert get1("dist(1, 1, 2, 4, 6)") == pytest.approx(7.0)
    assert get1("dist(0, 1, 2, 4, 2)") == 1  # sparseness norm

    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278)
    got = get1("geodist(48.8566, 2.3522, 51.5074, -0.1278)")
    lat1, lon1, lat2, lon2 = map(
        math.radians, (48.8566, 2.3522, 51.5074, -0.1278))
    a = (math.sin((lat1 - lat2) / 2) ** 2
         + math.cos(lat1) * math.cos(lat2)
         * math.sin((lon1 - lon2) / 2) ** 2)
    want = 2 * 6371.0087714 * math.asin(math.sqrt(a))
    assert got == pytest.approx(want, rel=1e-6)


def test_ms_date_parser(searcher):
    c = FunctionQueryCompiler(searcher)
    got = c.dataframe(
        "ms('2020-01-02T00:00:00Z', '2020-01-01T00:00:00Z')"
    ).limit(1).collect()[0]["score"]
    assert got == 86_400_000
    got = c.dataframe("ms('1970-01-01T00:00:10Z')").limit(
        1).collect()[0]["score"]
    assert got == 10_000


def test_tf_ord_rord(searcher):
    """tf = similarity tf = sqrt(raw freq) (TFValueSource over
    TFIDFSimilarity); ord/rord = 1-based ordinal in the field's sorted
    value space (OrdFieldSource/ReverseOrdFieldSource)."""
    row = _common_term(searcher)
    t = row["term"]
    c = FunctionQueryCompiler(searcher)
    raw = {r["docid"]: r["score"] for r in
           c.dataframe(f"termfreq(content,'{t}')").collect()}
    got = {r["docid"]: r["score"] for r in
           c.dataframe(f"tf(content,'{t}')").collect()}
    for d, v in got.items():
        assert v == pytest.approx(math.sqrt(raw[d]))

    dls = {r["docid"]: r["dl"] for r in
           searcher.docs.select("docid", "dl").collect()}
    ranks = {v: i + 1 for i, v in enumerate(sorted(set(dls.values())))}
    got = {r["docid"]: r["score"] for r in
           c.dataframe("ord(dl)").collect()}
    for d, v in got.items():
        assert v == ranks[dls[d]]
    rranks = {v: i + 1 for i, v in
              enumerate(sorted(set(dls.values()), reverse=True))}
    got = {r["docid"]: r["score"] for r in
           c.dataframe("rord(dl)").collect()}
    for d, v in got.items():
        assert v == rranks[dls[d]]


def test_query_and_boost_parsers(spark, searcher):
    """query('...') = subquery score or 0 (QueryValueSource);
    boost(q, f) = score x f (BoostedQuery role)."""
    from lucene_solr_spark.search.parser import QueryParser

    row = _common_term(searcher)
    t = row["term"]
    c = FunctionQueryCompiler(searcher)
    want = {r["docid"]: r["score"] for r in
            searcher.search_df(QueryParser().parse(t), k=None).collect()}
    got = {r["docid"]: r["score"] for r in
           c.dataframe(f"query('{t}')").collect()}
    assert len(got) == N_DOCS
    for d, v in got.items():
        assert v == pytest.approx(want.get(d, 0.0))
    got2 = {r["docid"]: r["score"] for r in
            c.dataframe(f"boost('{t}', 2)").collect()}
    for d, v in got2.items():
        assert v == pytest.approx(2 * want.get(d, 0.0))
