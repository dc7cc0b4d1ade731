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
