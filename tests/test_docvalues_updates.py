"""Numeric DocValues updates (index/docvalues.py):
IndexWriter.updateNumericDocValue / ReadersAndUpdates semantics —
gen'd patches, merge-on-read overlay, fold-at-merge."""

import pytest

from lucene_solr_spark.index.docvalues import (
    docvalues_info,
    fold_docvalues,
    read_docvalues,
    update_numeric_docvalue,
    write_docvalues,
)


def _vals(spark, pairs):
    return spark.createDataFrame(pairs, "docid long, value long")


@pytest.fixture()
def root(spark, tmp_path):
    r = str(tmp_path)
    write_docvalues(_vals(spark, [(i, i * 10) for i in range(8)]),
                    r, "popularity")
    return r


def _read(spark, r):
    return {row["docid"]: row["value"]
            for row in read_docvalues(spark, r, "popularity").collect()}


def test_base_reads_through(spark, root):
    assert _read(spark, root) == {i: i * 10 for i in range(8)}


def test_update_overlays_base(spark, root):
    g = update_numeric_docvalue(spark, root, "popularity",
                                _vals(spark, [(2, 999), (5, 111)]))
    assert g == 1
    got = _read(spark, root)
    assert got[2] == 999 and got[5] == 111
    assert got[0] == 0 and got[7] == 70          # untouched docs intact


def test_latest_generation_wins(spark, root):
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(3, 1)]))
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(3, 2), (4, 42)]))
    g3 = update_numeric_docvalue(spark, root, "popularity",
                                 _vals(spark, [(3, 3)]))
    assert g3 == 3
    got = _read(spark, root)
    assert got[3] == 3 and got[4] == 42
    assert docvalues_info(root, "popularity")["gens"] == [1, 2, 3]


def test_update_never_rewrites_base(spark, root):
    import glob
    import os

    base_files = sorted(glob.glob(os.path.join(root, "dv/popularity/base/*")))
    mtimes = [os.path.getmtime(p) for p in base_files]
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(0, 7)]))
    assert sorted(glob.glob(
        os.path.join(root, "dv/popularity/base/*"))) == base_files
    assert [os.path.getmtime(p) for p in base_files] == mtimes


def test_fold_preserves_reads_and_drops_gens(spark, root):
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(1, 5), (6, 6)]))
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(1, 8)]))
    before = _read(spark, root)
    fold_docvalues(spark, root, "popularity")
    info = docvalues_info(root, "popularity")
    assert info["gens"] == [] and info["has_base"]
    assert _read(spark, root) == before
    # post-fold updates start a fresh generation sequence
    assert update_numeric_docvalue(
        spark, root, "popularity", _vals(spark, [(0, 1)])) == 1


def test_absent_then_set_doc_appears(spark, root):
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(100, 12)]))
    assert _read(spark, root)[100] == 12


def test_function_query_reads_dv_overlay(spark, tmp_path):
    """field(popularity) in a function query resolves through the DV
    overlay and sees in-place updates without a rebuild."""
    from lucene_solr_spark.corpus import corpus_df
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.function_queries import (
        FunctionQueryCompiler,
    )

    root = str(tmp_path / "idx")
    tables = build_index(corpus_df(spark, 30, partitions=2), root)
    searcher = IndexSearcher(tables, cache=True)
    write_docvalues(
        _vals(spark, [(i, 100 + i) for i in range(30)]), root, "popularity")

    comp = FunctionQueryCompiler(searcher, dv_root=root)
    before = {r["docid"]: r["score"] for r in
              comp.dataframe("sum(field(popularity), 1)").collect()}
    assert before[5] == 106.0

    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(5, 1000)]))
    after = {r["docid"]: r["score"] for r in
             comp.dataframe("sum(field(popularity), 1)").collect()}
    assert after[5] == 1001.0
    assert after[6] == before[6] == 107.0


def test_strict_contract_excludes_new_docs_and_broadcasts(spark, root):
    update_numeric_docvalue(spark, root, "popularity",
                            _vals(spark, [(100, 12), (1, 5)]))
    strict = read_docvalues(spark, root, "popularity",
                            include_new_docs=False)
    ids = {r["docid"] for r in strict.collect()}
    assert 100 not in ids and strict.count() == 8
    # the overlay join must actually broadcast the patch side
    plan = strict._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
