"""FeatureField / FeatureQuery (document/FeatureField.java) —
encode/decode properties, default-pivot derivation, and engine/oracle
rank+score identity for log / saturation / sigmoid feature scoring,
standalone and as the javadoc's MUST(text) + SHOULD(feature) combo."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.index.features import add_features
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.feature import (
    MAX_FREQ,
    compute_pivot,
    decode_feature_value,
    encode_feature_value,
    new_log_query,
    new_saturation_query,
    new_sigmoid_query,
)
from lucene_solr_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    TermQuery,
)

N_DOCS = 100


def _feature_value(docid: int) -> float:
    # deterministic pagerank-ish positive normal floats
    return 0.25 + ((docid * 37) % 100) / 8.0


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_feat"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    # pagerank on even docids only (feature-less docs must simply not
    # score from the SHOULD feature clause); urllen on all docs
    feats = pd.DataFrame({
        "docid": ([d for d in range(N_DOCS) if d % 2 == 0]
                  + list(range(N_DOCS))),
        "feature": (["pagerank"] * (N_DOCS // 2) + ["urllen"] * N_DOCS),
        "value": ([_feature_value(d) for d in range(N_DOCS) if d % 2 == 0]
                  + [1.0 / (1 + (d % 7)) for d in range(N_DOCS)]),
    })
    add_features(tables, spark.createDataFrame(feats))
    searcher = IndexSearcher(tables, cache=True)

    pdf = corpus_pandas(N_DOCS).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(
        stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    for d in range(N_DOCS):
        if d % 2 == 0:
            oracle.add_feature(d, "pagerank", _feature_value(d))
        oracle.add_feature(d, "urllen", 1.0 / (1 + (d % 7)))
    return searcher, oracle


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q
    assert got, f"empty result for {q}"


# ---- encode / decode ----------------------------------------------------

def test_encode_decode_relative_precision():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.uniform(1e-30, 1e-20, 200).astype(np.float32),
        rng.uniform(0.001, 1000.0, 400).astype(np.float32),
        rng.uniform(1e20, 1e30, 200).astype(np.float32),
    ])
    enc = np.array([encode_feature_value(float(v)) for v in vals])
    dec = decode_feature_value(enc)
    # top-9-bit storage => relative precision 2^-8
    # (FeatureField.java:60-64); decode truncates toward zero
    assert np.all(dec <= vals)
    assert np.all((vals - dec) / vals <= 2.0 ** -8 + 1e-9)


def test_encode_monotone_and_bounds():
    vs = [2.0 ** -126, 0.1, 0.5, 1.0, 1.5, 2.0, 1e10, 3.4e38]
    encs = [encode_feature_value(v) for v in vs]
    assert encs == sorted(encs)
    assert encs[-1] <= MAX_FREQ
    for bad in (0.0, -1.0, float("inf"), float("nan"), 1e-40):
        with pytest.raises(ValueError):
            encode_feature_value(bad)
    # clamp above MAX_FREQ (FeatureField.java:201-205)
    assert decode_feature_value(np.array([MAX_FREQ + 1]))[0] == np.float32(
        np.finfo(np.float32).max)


def test_factory_validation():
    with pytest.raises(ValueError):
        new_log_query("features", "pr", weight=65.0)
    with pytest.raises(ValueError):
        new_log_query("features", "pr", scaling_factor=0.5)
    with pytest.raises(ValueError):
        new_saturation_query("features", "pr", pivot=-1.0)
    with pytest.raises(ValueError):
        new_sigmoid_query("features", "pr", 1.0, pivot=0.0, exponent=0.5)
    with pytest.raises(ValueError):
        new_sigmoid_query("features", "pr", 1.0, pivot=1.0, exponent=0.0)


def test_compute_pivot_matches_reference_shape():
    # decode((float)(ttf/df)) — FeatureField.java:508-520
    df, ttf = 4, 4 * encode_feature_value(2.5)
    p = compute_pivot(df, ttf)
    assert p == pytest.approx(2.5, rel=2.0 ** -8 + 1e-6)
    assert compute_pivot(0, 0) == 1.0


# ---- engine/oracle identity ---------------------------------------------

def test_log_query_identity(built):
    searcher, oracle = built
    _identical(searcher, oracle,
               new_log_query("features", "pagerank", weight=2.0,
                             scaling_factor=1.5), k=15)


def test_saturation_query_identity_explicit_pivot(built):
    searcher, oracle = built
    _identical(searcher, oracle,
               new_saturation_query("features", "pagerank", weight=1.5,
                                    pivot=3.0), k=15)


def test_saturation_query_identity_default_pivot(built):
    searcher, oracle = built
    _identical(searcher, oracle,
               new_saturation_query("features", "pagerank"), k=15)


def test_sigmoid_query_identity(built):
    searcher, oracle = built
    _identical(searcher, oracle,
               new_sigmoid_query("features", "urllen", 3.0,
                                 pivot=0.3, exponent=0.6), k=15)


def test_boosted_text_plus_feature_combo(built):
    """The FeatureField javadoc usage (FeatureField.java:92-103):
    BM25 text query MUST + saturation feature SHOULD."""
    searcher, oracle = built
    text = BooleanQuery((
        BooleanClause(TermQuery("def"), "SHOULD"),
        BooleanClause(TermQuery("return"), "SHOULD"),
    ))
    q = BooleanQuery((
        BooleanClause(text, "MUST"),
        BooleanClause(new_saturation_query("features", "pagerank"),
                      "SHOULD"),
    ))
    _identical(searcher, oracle, q, k=20)
    # the feature clause must actually change the ranking vs text-only
    text_only = [d.docid for d in oracle.search(text, 20)]
    combo = [d.docid for d in oracle.search(q, 20)]
    assert text_only != combo


def test_missing_feature_term_matches_nothing(built):
    searcher, oracle = built
    q = new_log_query("features", "nosuchfeature")
    assert searcher.search(q, 5) == []
    assert oracle.search(q, 5) == []
