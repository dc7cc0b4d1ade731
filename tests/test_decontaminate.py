"""Benchmark decontamination (suite row decontaminate_ngram):
hand-computed tiny corpus + plan hygiene."""

from lucene_solr_spark.relational.suite import decontaminate_ngram


def _write(spark, d, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_decontaminate_values(spark, tmp_path):
    eval_text = "a b c d e f g h i j"          # doc 0 → eval split (0 % 50 == 0)
    rows = [
        (0, eval_text, "en", "s", 19),
        # shares the 8-gram "a b c d e f g h" (and 2 more) with doc 0
        (1, "x a b c d e f g h i z", "en", "s", 21),
        # same words, different order → no 8-gram collision
        (2, "j i h g f e d c b a", "en", "s", 19),
        # too short for any 8-gram
        (3, "a b c", "en", "s", 5),
    ]
    sf = _write(spark, tmp_path, rows)
    out = {r["doc_id"]: (r["shared_ngrams"], r["contaminated"])
           for r in decontaminate_ngram(spark, sf).collect()}
    assert set(out) == {1, 2, 3}      # eval docs excluded from output
    # doc1 windows hitting doc0's grams: "a..h", "b..i" → 2 shared
    assert out[1] == (2, 1)
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)


def test_decontaminate_plan_stays_jvm(spark, tmp_path):
    sf = _write(spark, tmp_path, [(0, "a b", "en", "s", 3)])
    plan = decontaminate_ngram(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
