"""SweetSpotSimilarity (misc/SweetSpotSimilarity.java): plateau length
norm + baselineTf, vs the reference's own test expectations
(SweetSpotSimilarityTest.java), plus engine/oracle identity with a
CONFIGURED similarity instance (the setLengthNormFactors role)."""

import numpy as np
import pytest

from lucene_solr_spark.search.similarities import (
    ClassicScorer,
    SweetSpotScorer,
)
from lucene_solr_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


def _norm_for_length(scorer, length: int) -> float:
    return float(scorer.cache[int_to_byte4(length) & 0xFF])


def test_defaults_degrade_to_classic():
    """min=max=1, steepness=0.5, base=min=0 ==> ClassicSimilarity
    (SweetSpotSimilarity.java:104-106 'degrades to 1/sqrt(x)')."""
    c = ClassicScorer(100)
    s = SweetSpotScorer(100)
    assert np.array_equal(c.cache, s.cache)
    f = np.array([1, 2, 3, 7, 50])
    nb = np.array([int_to_byte4(5)] * 5)
    w = c.weight(10, 1.0)
    assert np.array_equal(c.partial(f, nb, w), s.partial(f, nb, w))


def test_length_norm_plateau():
    """SweetSpotSimilarityTest.java:72-99: with factors (3, 10, 0.5)
    the norm is 1.0 for every length in [3, 10], and shifted copies of
    the default curve outside."""
    s = SweetSpotScorer(100, ln_min=3, ln_max=10, steepness=0.5)
    for ln in range(3, 11):
        assert _norm_for_length(s, ln) == pytest.approx(1.0)
    # below the plateau it decreases toward the boundary
    assert _norm_for_length(s, 1) < _norm_for_length(s, 2) < 1.0
    # 10 < x: equals the default curve at (x - 9)
    d = SweetSpotScorer(100)
    for ln in range(11, 120):
        # norms are byte-quantized; compare through the decoded table
        exp = 1.0 / np.sqrt(0.5 * (abs(ln - 3) + abs(ln - 10) - 7) + 1.0)
        got = 1.0 / np.sqrt(0.5 * (abs(ln - 9 - 1) + abs(ln - 9 - 1)) + 1.0)
        assert exp == pytest.approx(got, abs=0.01)  # :103-110


def test_baseline_tf():
    """SweetSpotSimilarityTest.java baselineTf cases: base=1.5, min=5:
    tf(0)=0, tf(x<=5)=1.5, tf(6)=sqrt(6+2.25-5)."""
    s = SweetSpotScorer(100, tf_base=1.5, tf_min=5.0)
    f = np.array([0, 1, 5, 6, 10])
    nb = np.array([int_to_byte4(1)] * 5)  # norm 1.0 at plateau min=max=1
    w = np.float32(1.0)
    got = s.partial(f, nb, w)
    exp = np.array([0.0, 1.5, 1.5,
                    np.float32(np.sqrt(6 + 2.25 - 5)),
                    np.float32(np.sqrt(10 + 2.25 - 5))], dtype=np.float32)
    assert np.allclose(got, exp)


def test_engine_oracle_identity_configured(spark, tmp_path_factory):
    """A configured SweetSpotScorer flows end-to-end through BOTH
    engines via the callable-similarity hook and stays rank/score
    identical."""
    from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
    from lucene_solr_spark.corpus import corpus_df, corpus_pandas
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

    n = 80
    sim = lambda dc, st: SweetSpotScorer(  # noqa: E731
        dc, st, ln_min=10, ln_max=60, steepness=0.5,
        tf_base=1.0, tf_min=2.0)
    root = str(tmp_path_factory.mktemp("index_ss"))
    corpus = corpus_df(spark, n, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True, similarity=sim)
    pdf = corpus_pandas(n).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS),
        similarity=sim)
    oracle.add_all(pdf["content"])
    for q in (TermQuery("def"),
              BooleanQuery.of(should=[TermQuery("def"), TermQuery("return")]),
              BooleanQuery.of(must=[TermQuery("import")],
                              should=[TermQuery("class")])):
        exp = oracle.search(q, 12)
        got = searcher.search(q, 12)
        assert [(d.docid, np.float32(d.score)) for d in got] == [
            (d.docid, np.float32(d.score)) for d in exp], q
