"""IR quality evaluation (lucene/benchmark quality package):
QualityStats conventions — AP over TOTAL relevant, MRR only within
top-5, P@n tail extrapolation — hand-computed goldens, and the
DataFrame rendering must equal the driver-side loop exactly."""

import pytest

from lucene_solr_spark.search.quality import (
    TrecJudge,
    evaluate_run_df,
    judge_run,
)


def test_quality_stats_hand_computed():
    judge = TrecJudge({"q1": {1, 3, 9}, "q2": {7}})
    run = {"q1": [1, 2, 3, 4, 5], "q2": [5, 6, 7, 8]}
    out = judge_run(run, judge, points=(1, 5, 10))
    s1 = out["per_query"]["q1"]
    # relevant at ranks 1 and 3 of 3 total: AP = (1/1 + 2/3)/3
    assert s1["ap"] == pytest.approx((1 + 2 / 3) / 3)
    assert s1["rr"] == 1.0
    assert s1["p1"] == 1.0
    assert s1["p5"] == pytest.approx(2 / 5)
    # only 5 results: P@10 extrapolates (numPoints * p[numPoints])/10
    assert s1["p10"] == pytest.approx(5 * (2 / 5) / 10)
    assert s1["recall"] == pytest.approx(2 / 3)
    s2 = out["per_query"]["q2"]
    # first (only) relevant at rank 3 → RR counts (<=5): 1/3
    assert s2["rr"] == pytest.approx(1 / 3)
    assert s2["ap"] == pytest.approx((1 / 3) / 1)
    assert out["mean"]["ap"] == pytest.approx(
        (s1["ap"] + s2["ap"]) / 2)


def test_mrr_top5_quirk():
    judge = TrecJudge({"q": {42}})
    # first relevant at rank 6: the reference's MRR stays 0
    # (QualityStats.java:88-90 counts only ranks <= 5)
    out = judge_run({"q": [1, 2, 3, 4, 5, 42]}, judge)
    assert out["per_query"]["q"]["rr"] == 0.0
    assert out["per_query"]["q"]["ap"] == pytest.approx(1 / 6)


def test_dataframe_rendering_matches_loop(spark):
    import random

    rng = random.Random(12)
    qrels = {f"q{i}": set(rng.sample(range(100), rng.randint(1, 8)))
             for i in range(12)}
    run = {f"q{i}": rng.sample(range(100), rng.randint(3, 25))
           for i in range(12)}
    want = judge_run(run, TrecJudge(qrels), points=(5, 10))["per_query"]
    run_rows = [(q, d, r + 1) for q, docs in run.items()
                for r, d in enumerate(docs)]
    jrows = [(q, d) for q, rel in qrels.items() for d in rel]
    rdf = spark.createDataFrame(run_rows, "qid string, doc_id long, rank int")
    jdf = spark.createDataFrame(jrows, "qid string, doc_id long")
    got = {r["qid"]: r.asDict()
           for r in evaluate_run_df(rdf, jdf, points=(5, 10)).collect()}
    assert set(got) == set(want)
    for q in want:
        for k in ("ap", "rr", "recall", "p5", "p10"):
            assert got[q][k] == pytest.approx(want[q][k], abs=1e-9), (q, k)


def test_end_to_end_engine_quality(spark, sf_dir):
    """QualityBenchmark role over the real engine: topics = terms,
    judgments = docs containing the term; MAP of BM25 top-k must be
    high (docs containing the term rank above those that don't)."""
    from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_solr_spark.corpus import corpus_pandas
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.search.queries import TermQuery

    pdf = (corpus_pandas(80)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    vocab = sorted({t for _f, t in oracle.postings})
    topics = [t for t in vocab if 3 <= oracle.doc_freq(t) <= 20][:6]
    qrels = {t: {d for d, _tf, _p in oracle.postings[("content", t)]}
             for t in topics}
    run = {t: [d.docid for d in oracle.search(TermQuery(t), 20)]
           for t in topics}
    out = judge_run(run, TrecJudge(qrels), points=(5, 10))
    # every retrieved doc for a TermQuery contains the term: AP = recall
    for t in topics:
        s = out["per_query"][t]
        assert s["ap"] == pytest.approx(s["recall"])
    assert out["mean"]["ap"] > 0.9
