"""Gopher-style repetition quality signals (suite row gopher_repetition).

Hand-computed oracle on a tiny corpus: duplicate-word fraction and
most-frequent-2-gram character occupancy (Rae et al. 2021 §A1.1,
word-level adaptation — the corpus has no newlines)."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.relational.suite import gopher_repetition


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    rows = [
        # "a b a b a" — words=5 distinct=2 dup=0.6; bigrams: "a b"x2,
        # "b a"x2 → top (tie) = "a b" count 2, chars 9
        (0, "a b a b a", "en", "s", 9),
        # all-distinct 20-word doc: dup=0; top bigram "w00 w01" count 1,
        # 7 chars / 79 total = 0.0886 <= 0.2 → passes Gopher
        (1, " ".join(f"w{i:02d}" for i in range(20)), "en", "s", 79),
        # single word → filtered out (needs >= 2 words)
        (2, "solo", "en", "s", 4),
        # heavy bigram repeat: "x y x y x y x y" words=8 distinct=2
        # dup=0.75; "x y"x4 "y x"x3 → top "x y" 4*3/15=0.8
        (3, "x y x y x y x y", "en", "s", 15),
    ]
    d = tmp_path_factory.mktemp("gopherdocs")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_gopher_repetition_values(spark, docs_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(spark, docs_dir).collect()
    }
    assert set(out) == {0, 1, 3}  # doc 2 (single word) excluded

    r0 = out[0]
    assert r0["word_count"] == 5
    assert r0["dup_word_frac"] == pytest.approx(0.6)
    assert r0["top_bigram"] == "a b"  # tie with "b a", lexicographic min
    assert r0["top_bigram_char_frac"] == pytest.approx(round(2 * 3 / 9, 4))
    assert r0["gopher_ok"] == 0  # dup 0.6 > 0.3

    r1 = out[1]
    assert r1["dup_word_frac"] == 0.0
    assert r1["top_bigram"] == "w00 w01"  # count-1 tie, lexicographic min
    assert r1["top_bigram_char_frac"] == pytest.approx(round(7 / 79, 4))
    assert r1["gopher_ok"] == 1

    r3 = out[3]
    assert r3["dup_word_frac"] == pytest.approx(0.75)
    assert r3["top_bigram"] == "x y"
    assert r3["top_bigram_char_frac"] == pytest.approx(0.8)
    assert r3["gopher_ok"] == 0


def test_gopher_plan_stays_jvm(spark, docs_dir):
    # the whole op must be codegen'd expressions + doc-keyed shuffles:
    # no Python UDF in the plan
    plan = gopher_repetition(spark, docs_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
