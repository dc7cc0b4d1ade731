"""Per-source quota sampling (suite row source_quota_sample): domain-cap
curation with a WindowGroupLimit-safe plan."""

import pyspark.sql.functions as F

from lucene_solr_spark.relational.suite import source_quota_sample


def _write_docs(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_quota_caps_and_ranks(spark, tmp_path):
    rows = []
    # source A: 15 docs with increasing duplication (decreasing quality)
    for i in range(15):
        words = ["w%d" % k for k in range(20 - i)] + ["dup"] * i
        rows.append((i, " ".join(words), "en", "A", 100))
    # source B: 3 docs, all identical quality → tie-break by doc_id
    for i in range(3):
        rows.append((100 + i, "x y z", "en", "B", 5))
    sf = _write_docs(spark, tmp_path, rows)
    out = source_quota_sample(spark, sf).collect()
    a = sorted((r["rnk"], r["doc_id"]) for r in out if r["source"] == "A")
    b = sorted((r["rnk"], r["doc_id"]) for r in out if r["source"] == "B")
    assert len(a) == 10  # capped at the quota
    assert [d for _r, d in a] == list(range(10))  # best quality first
    assert b == [(1, 100), (2, 101), (3, 102)]  # quality tie → doc_id order


def test_quota_plan_uses_window_group_limit(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(0, "a b", "en", "A", 3)])
    plan = source_quota_sample(spark, sf)._jdf.queryExecution().executedPlan().toString()
    # the rnk <= N filter must be pushed into the window sort so a
    # skewed source never gets fully sorted
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
