"""LTR rerank: feature extraction vs oracle scores, linear model and
additive-trees model identity with a hand-evaluated expectation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import ltr
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, PhraseQuery, TermQuery

N_DOCS = 80


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_ltr"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


FEATURES = {
    "f_geter": TermQuery("geter0"),
    "f_phrase": PhraseQuery(("builder0", "scaned11")),
}


def _q(oracle):
    v = sorted((t for _f, t in oracle.postings),
               key=lambda t: -oracle.doc_freq(t))
    return BooleanQuery.of(should=[TermQuery(v[0]), TermQuery(v[1])])


def test_extract_features_matches_oracle(built):
    searcher, oracle = built
    q = _q(oracle)
    first = [d.docid for d in oracle.search(q, 20)]
    cand = searcher.search_df(q, None).orderBy(
        F.desc("score"), F.asc("docid")).limit(20).select("docid")
    fm = {r["docid"]: r for r in
          ltr.extract_features(searcher, cand, FEATURES).collect()}
    assert set(fm) == set(first)
    for name, fq in FEATURES.items():
        exp = {d.docid: d.score for d in oracle.search(fq, 10_000)}
        for d in first:
            assert fm[d][name] == pytest.approx(exp.get(d, 0.0), rel=1e-6)


def test_linear_rerank_identity(built):
    searcher, oracle = built
    q = _q(oracle)
    weights = {"originalScore": 1.0, "f_geter": 0.5, "f_phrase": 2.0}
    got = ltr.ltr_rerank(searcher, q, FEATURES,
                         ltr.linear_score_column(weights),
                         rescore_n=20, k=10).collect()
    # hand-evaluate on oracle scores
    first = oracle.search(q, 20)
    f1 = {d.docid: d.score for d in oracle.search(FEATURES["f_geter"], 10_000)}
    f2 = {d.docid: d.score for d in oracle.search(FEATURES["f_phrase"], 10_000)}
    exp = sorted(
        ((d.score + 0.5 * f1.get(d.docid, 0.0) + 2.0 * f2.get(d.docid, 0.0),
          d.docid) for d in first),
        key=lambda x: (-x[0], x[1]))[:10]
    assert [(r["docid"]) for r in got] == [d for _s, d in exp]
    for r, (s, _d) in zip(got, exp):
        assert r["ltr_score"] == pytest.approx(s, rel=1e-6)


def test_trees_model(built):
    searcher, oracle = built
    q = _q(oracle)
    # one tree: if f_geter < 0.1 → 0.0 else (if originalScore < 1.0
    # → 0.5 else 1.0); plus a half-weight stump on f_phrase
    t1 = ltr.TreeNode(
        feature="f_geter", threshold=0.1,
        left=ltr.TreeNode(value=0.0),
        right=ltr.TreeNode(feature="originalScore", threshold=1.0,
                           left=ltr.TreeNode(value=0.5),
                           right=ltr.TreeNode(value=1.0)))
    t2 = ltr.TreeNode(feature="f_phrase", threshold=0.01,
                      left=ltr.TreeNode(value=0.0),
                      right=ltr.TreeNode(value=1.0))
    got = ltr.ltr_rerank(searcher, q, FEATURES,
                         ltr.trees_score_column([(1.0, t1), (0.5, t2)]),
                         rescore_n=20, k=20, keep_features=True).collect()

    def eval_tree(node, feats):
        if node.feature is None:
            return node.value
        branch = node.left if feats[node.feature] < node.threshold \
            else node.right
        return eval_tree(branch, feats)

    for r in got:
        feats = {"f_geter": r["f_geter"], "f_phrase": r["f_phrase"],
                 "originalScore": r["originalScore"]}
        exp = 1.0 * eval_tree(t1, feats) + 0.5 * eval_tree(t2, feats)
        assert r["ltr_score"] == pytest.approx(exp, abs=1e-9)
    # codegen check: the MODEL is a pure Column expression — applied
    # to a plain feature frame, the plan has no python UDF eval (the
    # engine's first-pass BM25 scorer upstream legitimately uses an
    # Arrow UDF; the model itself must not add one)
    spark = searcher.docs.sparkSession
    feats_df = spark.createDataFrame(
        [(1.0, 0.5, 2.0)], "f_geter double, f_phrase double, "
                           "originalScore double")
    scored = feats_df.withColumn(
        "ltr_score", ltr.trees_score_column([(1.0, t1), (0.5, t2)]))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
