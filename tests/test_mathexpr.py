"""Math-expression variable context (streaming/mathexpr.py — the
io/eval half of Lang.java: distributions, fitters, hypothesis tests,
clustering) + the let()/col()/tuple() stream glue.

Goldens are textbook values (N(0,1) quantiles, closed-form gamma CDF,
hand-computed ANOVA/chi-square) — nothing is compared against any
library output.
"""

import math

import numpy as np
import pytest

from lucene_solr_spark.streaming.expressions import parse_expression
from lucene_solr_spark.streaming.mathexpr import (
    MathContext,
    Matrix,
    _betainc,
    _gammainc_lower,
    eval_math,
)


def ev(s, env=None):
    return eval_math(parse_expression(s), MathContext(env or {}, s))


# ---- special functions --------------------------------------------------

def test_incomplete_beta_and_gamma():
    # I_x(1, 1) = x (uniform CDF); I_x(a, b) symmetry
    assert _betainc(1, 1, 0.3) == pytest.approx(0.3, abs=1e-12)
    assert _betainc(2, 3, 0.4) == pytest.approx(
        1 - _betainc(3, 2, 0.6), abs=1e-10)
    # P(1, x) = 1 - e^-x
    assert _gammainc_lower(1.0, 2.0) == pytest.approx(
        1 - math.exp(-2), abs=1e-10)
    # P(2, x) = 1 - e^-x (1 + x)
    assert _gammainc_lower(2.0, 3.0) == pytest.approx(
        1 - math.exp(-3) * 4, abs=1e-10)


# ---- distributions ------------------------------------------------------

def test_distribution_cdfs_closed_forms():
    assert ev("cumulativeProbability(normalDistribution(0, 1), 1.959964)") \
        == pytest.approx(0.975, abs=1e-4)
    assert ev("cumulativeProbability(uniformDistribution(2, 4), 3)") == 0.5
    # gamma(shape=2, scale=2) at 4: 1 - e^-2 * (1 + 2)
    assert ev("cumulativeProbability(gammaDistribution(2, 2), 4)") \
        == pytest.approx(1 - math.exp(-2) * 3, abs=1e-9)
    # beta(2,2) cdf = 3x^2 - 2x^3
    assert ev("cumulativeProbability(betaDistribution(2, 2), 0.25)") \
        == pytest.approx(3 * 0.0625 - 2 * 0.015625, abs=1e-9)
    assert ev("cumulativeProbability(weibullDistribution(1, 2), 2)") \
        == pytest.approx(1 - math.exp(-1), abs=1e-12)
    assert ev("probability(poissonDistribution(3), 0)") \
        == pytest.approx(math.exp(-3), abs=1e-12)
    assert ev("probability(binomialDistribution(4, 0.5), 2)") \
        == pytest.approx(6 / 16, abs=1e-12)
    assert ev("probability(uniformIntegerDistribution(1, 6), 3)") \
        == pytest.approx(1 / 6)
    assert ev("probability(geometricDistribution(0.5), 1)") \
        == pytest.approx(0.25)
    assert ev("cumulativeProbability(triangularDistribution(0, 1, 2), 1)") \
        == pytest.approx(0.5)
    # zipf(3, 1): H = 1 + 1/2 + 1/3
    assert ev("probability(zipFDistribution(3, 1), 2)") \
        == pytest.approx((1 / 2) / (11 / 6))


def test_sampling_seeded_deterministic():
    a = ev("sample(normalDistribution(0, 1), 8)")
    b = ev("sample(normalDistribution(0, 1), 8)")
    assert np.array_equal(a, b)  # same expression -> same draws
    c = ev("sample(normalDistribution(0, 1), 9)")
    assert not np.array_equal(a, c[:8])  # different expr -> new stream
    # two sample() calls INSIDE one expression draw independently
    d = ev("ebeSubtract(sample(normalDistribution(0, 1), 8), "
           "sample(normalDistribution(0, 1), 8))")
    assert np.abs(d).max() > 0
    # empirical sanity at scale
    big = ev("sample(normalDistribution(10, 2), 4000)")
    assert big.mean() == pytest.approx(10, abs=0.15)
    assert big.std(ddof=1) == pytest.approx(2, abs=0.15)


def test_monte_carlo_redraws_each_iteration():
    v = ev("monteCarlo(mean(sample(uniformDistribution(0, 1), 10)), 50)")
    assert v.size == 50
    assert np.unique(v).size > 40  # each iteration drew fresh samples
    assert v.mean() == pytest.approx(0.5, abs=0.05)


def test_markov_chain_walk():
    # absorbing-ish chain: state 1 self-loops with high probability
    walk = ev("sample(markovChain(matrix(array(0.1, 0.9), "
              "array(0.05, 0.95))), 200)")
    assert walk.size == 200
    assert (walk == 1).mean() > 0.8


# ---- fitters ------------------------------------------------------------

def test_polyfit_spline_akima_lerp_derivative():
    # exact quadratic recovered by polyfit
    assert ev("predict(polyfit(array(0,1,4,9,16,25), "
              "array(0,1,2,3,4,5), 2), 7)") == pytest.approx(49, abs=1e-6)
    # lerp hits the knots and interpolates linearly
    assert ev("predict(lerp(array(0,1,2), array(0,10,20)), 1.5)") \
        == pytest.approx(15)
    # natural cubic spline reproduces knot values exactly
    assert ev("predict(spline(array(0,1,2,3), array(5,7,2,9)), 2)") \
        == pytest.approx(2, abs=1e-9)
    assert ev("predict(akima(array(0,1,2,3,4), array(0,1,2,3,4)), 2.5)") \
        == pytest.approx(2.5, abs=1e-9)
    # derivative of a straight-line fit is the slope everywhere
    d = ev("predict(derivative(lerp(array(0,1,2,3), array(0,2,4,6))), "
           "1.7)")
    assert d == pytest.approx(2, abs=1e-6)
    # loess smooths toward the underlying line
    y = ev("predict(loess(sequence(20, 0, 1), "
           "add(sequence(20, 0, 2), 0)), 10)")
    assert y == pytest.approx(20, abs=1e-6)


def test_harmonic_and_bicubic():
    got = ev("predict(harmonicFit(array(%s)), 20)" % ",".join(
        str(round(3 * math.sin(0.7 * i) + 1, 6)) for i in range(30)))
    assert got == pytest.approx(3 * math.sin(0.7 * 20) + 1, abs=0.05)
    v = ev("predict(bicubicSpline(array(0,1,2), array(0,1,2), "
           "matrix(array(0,1,2), array(1,2,3), array(2,3,4))), 0.5, 1.5)")
    assert v == pytest.approx(2.0, abs=1e-9)


def test_ols_regress_and_predict():
    m = ev("olsRegress(matrix(array(1,1), array(2,1), array(3,2), "
           "array(4,2)), array(6, 8, 13, 15))")
    # y = 1 + 2*x1 + 3*x2 exactly
    assert m["coefficients"] == pytest.approx([1, 2, 3], abs=1e-9)
    assert m["RSquared"] == pytest.approx(1.0, abs=1e-12)
    p = ev("predict(olsRegress(matrix(array(1,1), array(2,1), "
           "array(3,2), array(4,2)), array(6, 8, 13, 15)), array(5, 3))")
    assert p == pytest.approx(20, abs=1e-8)


# ---- hypothesis tests ---------------------------------------------------

def test_ttest_known_value():
    # equal-size, known Welch t: a = [1..5], b = [3..7] -> t = -2,
    # df = 8, two-sided p = 0.0805 (t-table)
    r = ev("ttest(array(1,2,3,4,5), array(3,4,5,6,7))")
    assert r["t-statistic"] == pytest.approx(-2.0, abs=1e-9)
    assert r["p-value"] == pytest.approx(0.0805, abs=2e-3)


def test_paired_ttest_constant_shift():
    r = ev("pairedTtest(array(1,2,3,4,5), array(2,3,4,5,6.5))")
    assert r["p-value"] < 0.01  # consistent positive shift


def test_anova_golden():
    r = ev("anova(array(1,2,3), array(2,3,4), array(9,10,11))")
    assert r["f-ratio"] == pytest.approx(57.0, abs=1e-9)
    assert r["p-value"] == pytest.approx(0.000125, abs=1e-5)


def test_chi_square_and_gtest():
    r = ev("chiSquareDataSet(array(10, 12, 8), array(10, 10, 10))")
    assert r["chisquare-statistic"] == pytest.approx(0.8)
    # chi2 cdf df=2 is exponential: p = e^{-0.4}
    assert r["p-value"] == pytest.approx(math.exp(-0.4), abs=1e-9)
    g = ev("gtestDataSet(array(10, 12, 8), array(10, 10, 10))")
    assert g["G-statistic"] == pytest.approx(
        2 * (12 * math.log(1.2) + 8 * math.log(0.8)), abs=1e-9)


def test_mann_whitney_disjoint():
    r = ev("mannWhitney(array(1,2,3,4,5), array(6,7,8,9,10))")
    assert r["u-statistic"] == 25.0
    assert r["p-value"] < 0.01


def test_kolmogorov_smirnov_both_modes():
    one = ev("kolmogorovSmirnov(uniformDistribution(0, 1), "
             "array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
    assert one["d-statistic"] == pytest.approx(0.1, abs=1e-9)
    assert one["p-value"] > 0.99
    two = ev("ks(array(1,2,3,4,5,6,7,8), array(101,102,103,104))")
    assert two["d-statistic"] == pytest.approx(1.0)


def test_corr_pvalues():
    m = ev("corrPValues(corr(matrix(array(1, 10), array(2, 12), "
           "array(3, 14), array(4, 17))), 4)")
    # perfect-ish correlation -> tiny p off-diagonal, 0 diagonal
    assert m.data[0, 0] == 0.0
    assert m.data[0, 1] < 0.05


# ---- vectors / matrices / misc -----------------------------------------

def test_vector_matrix_misc():
    assert list(ev("primes(5, 10)")) == [11, 13, 17, 19, 23]
    f = ev("fft(array(1, 0, 0, 0))")
    assert f.to_lists() == [[1, 1, 1, 1], [0, 0, 0, 0]]
    back = ev("ifft(fft(array(1, 2, 3, 4)))")
    assert back == pytest.approx([1, 2, 3, 4], abs=1e-9)
    ft = ev("freqTable(array(1, 1, 2, 3, 3, 3))")
    assert ft[2]["value"] == 3.0 and ft[2]["count"] == 3.0
    h = ev("hist(sample(normalDistribution(0, 1), 500), 10)")
    assert len(h) == 10 and sum(b["N"] for b in h) == 500
    labeled = ev('setRowLabels(setColumnLabels(matrix(array(1, 2), '
                 'array(3, 4)), array(c1, c2)), array(r1, r2))')
    assert ev("getRowLabels(m)", {"m": labeled}) == ["r1", "r2"]
    assert ev("getColumnLabels(m)", {"m": labeled}) == ["c1", "c2"]
    t = ev("setValue(tuple(a=1), b, 2)")
    assert ev("getValue(t, b)", {"t": t}) == 2


def test_knn_rows_and_termvectors():
    m = Matrix([[0, 0], [0, 1], [10, 10], [10, 11]],
               row_labels=["a", "b", "c", "d"])
    near = ev("knn(m, array(0, 0.4), 2)", {"m": m})
    assert near.row_labels == ["a", "b"]
    tv = ev("termVectors(docs, 3)", {"docs": [
        {"id": "d1", "terms": ["hello", "world", "hello"]},
        {"id": "d2", "terms": ["hello", "spark"]},
    ]})
    assert tv.row_labels == ["d1", "d2"]
    assert "hello" in tv.col_labels and "spark" in tv.col_labels
    # tf-idf: 'hello' appears in both docs -> idf = ln(1)+1 = 1
    hi = tv.col_labels.index("hello")
    assert tv.data[0, hi] == pytest.approx(2.0)


def test_kmeans_family():
    env = {"m": Matrix([[0, 0], [0, 1], [1, 0], [10, 10], [10, 11],
                        [11, 10]],
                       row_labels=list("abcdef"))}
    model = ev("kmeans(m, 2)", env)
    cents = sorted(ev("getCentroids(km)", {"km": model}).to_lists())
    assert cents[0] == pytest.approx([1 / 3, 1 / 3])
    assert cents[1] == pytest.approx([31 / 3, 31 / 3])
    cl = ev("getCluster(km, 0)", {"km": model})
    assert len(cl.data) == 3
    fz = ev("fuzzyKmeans(m, 2)", env)
    u = ev("getMembershipMatrix(fkm)", {"fkm": fz})
    assert u.data.shape == (6, 2)
    assert np.allclose(u.data.sum(1), 1.0)
    multi = ev("multiKmeans(m, 2, 4)", env)
    assert len(multi["assignments"]) == 6


# ---- let()/col()/tuple() glue over Spark streams ------------------------

def test_let_math_context_over_stream(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    df = spark.createDataFrame(
        [(i, float(2 * i + 1)) for i in range(12)], "id long, y double")
    sf = StreamFactory({"t": df})
    out = sf.compile(
        'let(a=search(t, q="*:*", fl="id,y", sort="id asc"), '
        'v=col(a, y), '
        'r=regress(sequence(length(v), 0, 1), v), '
        'tuple(n=length(v), slope=getValue(r, slope), '
        'icept=getValue(r, intercept), p=predict(r, 100)))').collect()[0]
    assert out["n"] == 12.0
    assert out["slope"] == pytest.approx(2.0, abs=1e-9)
    assert out["icept"] == pytest.approx(1.0, abs=1e-9)
    assert out["p"] == pytest.approx(201.0, abs=1e-6)


def test_random_stream_seeded(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    sf = StreamFactory({"t": df})
    a = [r["id"] for r in
         sf.compile('random(t, q="*:*", rows=5, fl="id")').collect()]
    b = [r["id"] for r in
         sf.compile('random(t, q="*:*", rows=5, fl="id")').collect()]
    assert a == b  # seeded: reruns reproduce the sample
    assert len(set(a)) == 5


def test_reduce_stream_group_topn(spark):
    from lucene_solr_spark.streaming.expressions import StreamFactory

    rows = [(g, i, float(10 * g + i)) for g in range(3) for i in range(5)]
    df = spark.createDataFrame(rows, "g long, i long, x double")
    sf = StreamFactory({"t": df})
    out = sf.compile(
        'reduce(search(t, q="*:*", fl="g,i,x", sort="g asc"), by="g", '
        'group(sort="x desc", n=2))').collect()
    assert len(out) == 6
    per_g = {}
    for r in out:
        per_g.setdefault(r["g"], []).append(r["x"])
    for g, xs in per_g.items():
        assert sorted(xs, reverse=True) == [10 * g + 4, 10 * g + 3]
