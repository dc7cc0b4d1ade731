"""Streaming-expression compiler: parse shapes + DataFrame semantics
vs the equivalent hand-built DataFrame queries (SURVEY §2.9 io/stream
+ io/eval coverage; reference solr/solrj/.../io/stream/*.java)."""

import pytest

from lucene_solr_spark.streaming.expressions import (
    ExprNode,
    StreamFactory,
    compile_evaluator,
    parse_expression,
)


def test_parse_nested_kwargs():
    n = parse_expression(
        'rollup(search(tbl, q="a:1", fl="a,b", sort="a asc"), '
        'over="a", sum(b), count(*))')
    assert n.name == "rollup"
    assert isinstance(n.args[0], ExprNode) and n.args[0].name == "search"
    assert n.args[0].kwargs["q"] == "a:1"
    assert [a.name for a in n.args[1:]] == ["sum", "count"]
    assert n.kwargs["over"] == "a"


def test_parse_quoted_escapes():
    n = parse_expression('select(s(t), "add(a, 1) as b")')
    assert n.args[1] == "add(a, 1) as b"


@pytest.fixture(scope="module")
def tables(spark):
    orders = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "a"), (4, 40, "c")],
        "id int, amount int, cat string")
    custs = spark.createDataFrame(
        [("a", "us"), ("b", "de"), ("c", "us")], "cat string, country string")
    return {"orders": orders, "custs": custs}


def test_search_q_fl_sort(spark, tables):
    df = StreamFactory(tables).compile(
        'search(orders, q="cat:a", fl="id,amount", sort="id desc")')
    assert [tuple(r) for r in df.collect()] == [(3, 30), (1, 10)]


def test_search_range_q(spark, tables):
    df = StreamFactory(tables).compile(
        'search(orders, q="amount:[20 TO 30]", fl="id", sort="id asc")')
    assert [r.id for r in df.collect()] == [2, 3]


def test_rollup_metrics(spark, tables):
    df = StreamFactory(tables).compile(
        'rollup(search(orders, q="*:*"), over="cat", sum(amount), count(*))')
    got = {r["cat"]: (r["sum(amount)"], r["count(*)"])
           for r in df.collect()}
    assert got == {"a": (40, 2), "b": (20, 1), "c": (40, 1)}


def test_inner_join_and_select_evaluator(spark, tables):
    df = StreamFactory(tables).compile(
        'select(innerJoin(search(orders, q="*:*"), search(custs, q="*:*"), '
        'on="cat"), id, "mult(amount, 2) as dbl")')
    got = {r.id: r.dbl for r in df.collect()}
    assert got == {1: 20, 2: 40, 3: 60, 4: 80}


def test_hash_join_broadcast(spark, tables):
    df = StreamFactory(tables).compile(
        'hashJoin(search(orders, q="*:*"), search(custs, q="*:*"), on="cat")')
    assert df.count() == 4
    assert "BroadcastHashJoin" in df._jdf.queryExecution().executedPlan().toString()


def test_left_outer_join(spark, tables):
    t2 = dict(tables)
    t2["custs"] = tables["custs"].where("country = 'us'")
    df = StreamFactory(t2).compile(
        'leftOuterJoin(search(orders, q="*:*"), search(custs, q="*:*"), on="cat")')
    rows = {r.id: r.country for r in df.collect()}
    assert rows[2] is None and rows[1] == "us"


def test_top_unique_sort_merge(spark, tables):
    f = StreamFactory(tables)
    top = f.compile('top(search(orders, q="*:*"), n="2", sort="amount desc")')
    assert [r.id for r in top.collect()] == [4, 3]
    uniq = f.compile('unique(sort(search(orders, q="*:*"), by="id asc"), over="cat")')
    assert uniq.count() == 3
    merged = f.compile(
        'merge(search(orders, q="cat:a", fl="id"), '
        'search(orders, q="cat:b", fl="id"), on="id asc")')
    assert [r.id for r in merged.collect()] == [1, 2, 3]


def test_having_on_rollup_metric(spark, tables):
    df = StreamFactory(tables).compile(
        'having(rollup(search(orders, q="*:*"), over="cat", sum(amount)), '
        'gt(sum(amount), 25))')
    assert sorted(r["cat"] for r in df.collect()) == ["a", "c"]


def test_facet(spark, tables):
    df = StreamFactory(tables).compile(
        'facet(orders, q="*:*", buckets="cat", bucketSorts="count(*) desc, cat asc", '
        'bucketSizeLimit="2", count(*))')
    assert [r["cat"] for r in df.collect()] == ["a", "b"]


def test_evaluator_tree():
    col = compile_evaluator(parse_expression("if(gt(add(a, 1), 5), a, 0)"))
    assert "CASE WHEN" in str(col) or "when" in str(col).lower()


def test_unknown_stream_raises(tables):
    with pytest.raises(ValueError):
        StreamFactory(tables).compile("frobnicate(x)")


def test_math_evaluator_zoo(spark):
    """io/eval math evaluator set (ModuloEvaluator, PowerEvaluator,
    SquareRoot/CubedRoot, NaturalLog/Log10, trig + hyperbolic,
    Ceiling/Floor) — evaluated in a select over a real frame and
    checked against Python math."""
    import math

    df = spark.createDataFrame([(9.0, 2.0)], "x double, y double")
    cases = {
        "mod(x, 4)": 1.0,
        "pow(y, 10)": 1024.0,
        "sqrt(x)": 3.0,
        "cbrt(add(x, 18))": 3.0,
        "log(x)": math.log(9.0),
        "log10(mult(x, y, 5.0, 10.0))": math.log10(900.0),
        "sin(0)": 0.0,
        "cos(0)": 1.0,
        "atan(tan(0.5))": 0.5,
        "asin(sin(0.5))": 0.5,
        "acos(cos(0.5))": 0.5,
        "sinh(0)": 0.0,
        "cosh(0)": 1.0,
        "tanh(0)": 0.0,
        "ceiling(div(x, y))": 5.0,
        "floor(div(x, y))": 4.0,
    }
    cols = [compile_evaluator(parse_expression(e)).alias(f"c{i}")
            for i, e in enumerate(cases)]
    row = df.select(*cols).collect()[0]
    for i, (e, exp) in enumerate(cases.items()):
        assert row[f"c{i}"] == pytest.approx(exp, abs=1e-12), e


def test_vector_evaluator_zoo(spark):
    """Lang.java vector/array evaluator family (ArrayEvaluator, EBE*,
    DotProduct/CosineSimilarity, distance metrics, L1Norm, Mean,
    Scale, NormalizeSum, MinMaxScale, ValueAt 0-based, Sequence, Rev,
    Length, Coalesce, Precision) — all pure JVM higher-order array
    functions, checked against numpy."""
    import numpy as np

    a = [1.0, 2.0, 3.0]
    b = [4.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [(a, b, None)], "a array<double>, b array<double>, z double")
    na, nb = np.array(a), np.array(b)
    cases = {
        "dotProduct(a, b)": float(na @ nb),
        "cosineSimilarity(a, b)": float(
            na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb))),
        "euclidean(a, b)": float(np.linalg.norm(na - nb)),
        "manhattan(a, b)": float(np.abs(na - nb).sum()),
        "chebyshev(a, b)": float(np.abs(na - nb).max()),
        "canberra(a, b)": float(
            (np.abs(na - nb) / (np.abs(na) + np.abs(nb))).sum()),
        "l1norm(a)": 6.0,
        "mean(a)": 2.0,
        "length(a)": 3,
        "valueAt(a, 1)": 2.0,           # 0-based (ValueAtEvaluator)
        "coalesce(z, mean(a))": 2.0,
        "precision(div(1, 3), 2)": 0.33,
    }
    cols = [compile_evaluator(parse_expression(e)).alias(f"c{i}")
            for i, e in enumerate(cases)]
    row = df.select(*cols).collect()[0]
    for i, (e, exp) in enumerate(cases.items()):
        assert row[f"c{i}"] == pytest.approx(exp, abs=1e-9), e

    arr_cases = {
        "ebeAdd(a, b)": (na + nb).tolist(),
        "ebeSubtract(b, a)": (nb - na).tolist(),
        "ebeMultiply(a, b)": (na * nb).tolist(),
        "ebeDivide(b, a)": (nb / na).tolist(),
        "rev(a)": a[::-1],
        "scale(2, a)": (2 * na).tolist(),
        "normalizeSum(a)": (na / na.sum()).tolist(),
        "minMaxScale(a)": ((na - na.min()) / (na.max() - na.min())).tolist(),
        "sequence(4, 10, 3)": [10, 13, 16, 19],
        "array(1, 2, 3)": [1, 2, 3],
    }
    cols = [compile_evaluator(parse_expression(e)).alias(f"c{i}")
            for i, e in enumerate(arr_cases)]
    row = df.select(*cols).collect()[0]
    for i, (e, exp) in enumerate(arr_cases.items()):
        got = list(row[f"c{i}"])
        assert got == pytest.approx(exp, abs=1e-9), e


def test_complement_and_intersect(spark, tables):
    f = StreamFactory(tables)
    comp = f.compile(
        'complement(search(orders, q="*:*", fl="id,cat", sort="id asc"), '
        'search(custs, q="country:us", fl="cat", sort="cat asc"), on="cat")')
    assert sorted(r.id for r in comp.collect()) == [2]      # only cat b
    inter = f.compile(
        'intersect(search(orders, q="*:*", fl="id,cat", sort="id asc"), '
        'search(custs, q="country:us", fl="cat", sort="cat asc"), on="cat")')
    assert sorted(r.id for r in inter.collect()) == [1, 3, 4]
    # B's fields are not emitted (IntersectStream contract)
    assert inter.columns == ["id", "cat"]


def test_outer_hash_join(spark, tables):
    t2 = dict(tables)
    t2["extra"] = tables["custs"].where("cat != 'c'")
    df = StreamFactory(t2).compile(
        'outerHashJoin(search(orders, q="*:*", fl="id,cat", sort="id asc"), '
        'search(extra, q="*:*", fl="cat,country", sort="cat asc"), on="cat")')
    rows = {r.id: r.country for r in df.collect()}
    assert rows == {1: "us", 2: "de", 3: "us", 4: None}


def test_cartesian_product_explodes_arrays(spark, tables):
    t = dict(tables)
    t["docs"] = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["z"])], "id int, tags array<string>")
    df = StreamFactory(t).compile(
        'cartesianProduct(search(docs, q="*:*", fl="id,tags", '
        'sort="id asc"), tags, productSort="tags asc")')
    assert [(r.id, r.tags) for r in df.collect()] == [
        (1, "x"), (1, "y"), (2, "z")]


def test_fetch_enriches_by_key(spark, tables):
    df = StreamFactory(tables).compile(
        'fetch(custs, search(orders, q="amount:[20 TO *]", fl="id,cat", '
        'sort="id asc"), fl="country", on="cat=cat")')
    assert [(r.id, r.country) for r in df.orderBy("id").collect()] == [
        (2, "de"), (3, "us"), (4, "us")]


def test_stats_single_tuple(spark, tables):
    df = StreamFactory(tables).compile(
        'stats(orders, q="cat:a", sum(amount), avg(amount), count(*))')
    r = df.collect()[0]
    assert (r["sum(amount)"], r["avg(amount)"], r["count(*)"]) == (40, 20.0, 2)


def test_string_and_temporal_evaluators(spark):
    df = spark.createDataFrame(
        [("  Ab ", "2024-03-15 10:30:45")], "s string, t string"
    ).withColumn("t", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("t"))
    exprs = {
        "upper(trim(s))": "AB",
        "concat(trim(s), trim(s))": "AbAb",
        "year(t)": 2024, "month(t)": 3, "day(t)": 15,
        "dayofyear(t)": 75, "hour(t)": 10, "minute(t)": 30,
        "second(t)": 45, "quarter(t)": 1, "week(t)": 11,
    }
    for e, want in exprs.items():
        got = df.select(
            compile_evaluator(parse_expression(e)).alias("v")).collect()[0]["v"]
        assert got == want, (e, got, want)


def test_variance_stddev_sample(spark):
    df = spark.createDataFrame([([2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0],)],
                               "a array<double>")
    var = df.select(compile_evaluator(
        parse_expression("var(a)")).alias("v")).collect()[0]["v"]
    sd = df.select(compile_evaluator(
        parse_expression("stddev(a)")).alias("v")).collect()[0]["v"]
    import math
    assert abs(var - 32.0 / 7) < 1e-9          # sample variance (n-1)
    assert abs(sd - math.sqrt(32.0 / 7)) < 1e-9


def test_quoted_literal_vs_field_reference(spark):
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    # quoted "b" is the literal string; bare b is the column
    lit = df.select(compile_evaluator(
        parse_expression('concat(a, "b")')).alias("v")).collect()[0]["v"]
    col = df.select(compile_evaluator(
        parse_expression("concat(a, b)")).alias("v")).collect()[0]["v"]
    assert (lit, col) == ("xb", "xy")
    eq = df.select(compile_evaluator(
        parse_expression('eq(a, "x")')).alias("v")).collect()[0]["v"]
    assert eq is True


def test_let_get_binding(spark, tables):
    df = StreamFactory(tables).compile(
        'let(a=search(orders, q="cat:a", fl="id,amount,cat", sort="id asc"), '
        'b=rollup(get(a), over="cat", sum(amount)), get(b))')
    assert [tuple(r) for r in df.collect()] == [("a", 40)]


def test_timeseries_calendar_gap(spark):
    from pyspark.sql import functions as SF

    rows = [("2024-01-05 10:00:00", 1.0), ("2024-01-20 11:00:00", 2.0),
            ("2024-02-02 09:00:00", 4.0), ("2024-03-30 23:59:59", 8.0),
            ("2024-04-01 00:00:00", 99.0)]          # outside [start, end)
    ev = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", SF.to_timestamp("ts"))
    df = StreamFactory({"events": ev}).compile(
        'timeseries(events, field="ts", start="2024-01-01T00:00:00", '
        'end="2024-04-01T00:00:00", gap="+1MONTH", sum(value), count(*))')
    got = [(r["ts_bucket"][:10], r["sum(value)"], r["count(*)"])
           for r in df.collect()]
    assert got == [("2024-01-01", 3.0, 2), ("2024-02-01", 4.0, 1),
                   ("2024-03-01", 8.0, 1)]


def test_sql_stream_and_echo(spark, tables):
    f = StreamFactory(tables)
    df = f.compile('sql(stmt="SELECT cat, sum(amount) AS s FROM orders '
                   'GROUP BY cat ORDER BY cat")')
    assert [tuple(r) for r in df.collect()] == [
        ("a", 40), ("b", 20), ("c", 40)]
    assert f.compile('echo("hi")').collect()[0]["echo"] == "hi"


def test_matrix_evaluators(spark):
    """Matrix family vs numpy (io/eval/MatrixEvaluator.java,
    TransposeEvaluator, MatrixMultiplyEvaluator, SumRows/SumColumns,
    GrandSum, Scalar*, RowAt/ColumnAt, Row/ColumnCount, cov/corr —
    Lang.java:120-234)."""
    import numpy as np

    a = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = np.array([[7.0, 8.0], [9.0, 10.0], [11.0, 12.0]])
    x = [2.0, 4.0, 6.0, 8.0]
    y = [1.0, 3.0, 2.0, 5.0]
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist(), x, y)],
        "a array<array<double>>, b array<array<double>>, "
        "x array<double>, y array<double>")

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    assert ev("transpose(a)") == a.T.tolist()
    assert ev("matrixMult(a, b)") == (a @ b).tolist()
    assert ev("rowCount(a)") == 2
    assert ev("columnCount(a)") == 3
    assert ev("rowAt(a, 1)") == a[1].tolist()
    assert ev("columnAt(a, 2)") == a[:, 2].tolist()
    assert ev("sumRows(a)") == a.sum(axis=1).tolist()
    assert ev("sumColumns(a)") == a.sum(axis=0).tolist()
    assert ev("grandSum(a)") == a.sum()
    assert ev("scalarAdd(10, a)") == (a + 10).tolist()
    assert ev("scalarMultiply(2, a)") == (a * 2).tolist()
    assert ev("scalarSubtract(1, a)") == (a - 1).tolist()
    assert ev("scalarDivide(2, a)") == (a / 2).tolist()
    import math

    assert math.isclose(ev("cov(x, y)"), float(np.cov(x, y, ddof=1)[0, 1]))
    assert math.isclose(ev("corr(x, y)"), float(np.corrcoef(x, y)[0, 1]))
    # matrix literal from vectors
    assert ev("matrix(x, y)") == [x, y]
    # composition: transpose(matrixMult) == matrixMult of transposes
    assert ev("transpose(matrixMult(a, b))") == (a @ b).T.tolist()


def test_numeric_array_evaluator_widening(spark):
    """Round-4 io/eval widening vs numpy (SumSq/L2Norm/LInfNorm/
    Unitize/Standardize/Mode/Percentile/Diff/MovingAverage/
    MovingMedian/Zeros/Ones/Factorial/BinomialCoefficient/
    Sum-MeanDifference/Distance/IndexOf/CopyOfRange/AddAll/Append —
    Lang.java registrations)."""
    import math

    import numpy as np

    x = [4.0, 1.0, 7.0, 2.0, 9.0, 3.0]
    y = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame(
        [(x, y)], "x array<double>, y array<double>")

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    xa, ya = np.array(x), np.array(y)
    assert ev("sumSq(x)") == float((xa ** 2).sum())
    assert math.isclose(ev("l2norm(x)"), float(np.linalg.norm(xa)))
    assert ev("linfnorm(x)") == 9.0
    assert np.allclose(ev("unitize(x)"), xa / np.linalg.norm(xa))
    assert np.allclose(ev("standardize(x)"),
                       (xa - xa.mean()) / xa.std(ddof=1))
    assert ev("mode(array(1, 2, 2, 3, 2))") == 2
    # commons-math legacy percentile: pos = p*(n+1)/100
    assert math.isclose(ev("percentile(x, 50)"), float(np.median(xa)))
    assert ev("percentile(x, 100)") == 9.0
    assert ev("diff(x)") == np.diff(xa).tolist()
    assert ev("diff(x, 2)") == (xa[2:] - xa[:-2]).tolist()
    assert np.allclose(
        ev("movingAvg(x, 3)"),
        [xa[i:i + 3].mean() for i in range(len(x) - 2)])
    assert ev("movingMedian(x, 3)") == [
        float(np.median(xa[i:i + 3])) for i in range(len(x) - 2)]
    assert ev("zeros(4)") == [0.0] * 4
    assert ev("ones(3)") == [1.0] * 3
    assert ev("factorial(6)") == 720.0
    assert ev("binomialCoefficient(10, 3)") == 120.0
    assert ev("sumDifference(x, y)") == float((xa - ya).sum())
    assert math.isclose(ev("meanDifference(x, y)"),
                        float((xa - ya).mean()))
    assert math.isclose(ev("distance(x, y)"),
                        float(np.linalg.norm(xa - ya)))
    assert ev("indexOf(x, 7)") == 2
    assert ev("copyOfRange(x, 1, 4)") == x[1:4]
    assert ev("copyOf(x, 3)") == x[:3]
    assert ev("addAll(x, y)") == x + y
    assert ev("append(y, 99)") == y + [99.0]
    assert ev("asc(x)") == sorted(x)
    assert len(ev("uuid()")) == 36


def test_regress_and_predict(spark):
    """RegressionEvaluator / PredictEvaluator: OLS slope/intercept/R²
    vs numpy.polyfit + correlation."""
    import math

    import numpy as np

    x = [1.0, 2.0, 3.0, 4.0, 5.0]
    y = [2.1, 3.9, 6.2, 8.1, 9.8]
    df = spark.createDataFrame([(x, y)], "x array<double>, y array<double>")

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    m = ev("regress(x, y)")
    slope, intercept = np.polyfit(np.array(x), np.array(y), 1)
    assert math.isclose(m["slope"], slope, rel_tol=1e-9)
    assert math.isclose(m["intercept"], intercept, rel_tol=1e-9)
    r = np.corrcoef(x, y)[0, 1]
    assert math.isclose(m["rSquared"], r * r, rel_tol=1e-9)
    p = ev("predict(regress(x, y), 6)")
    assert math.isclose(p, slope * 6 + intercept, rel_tol=1e-9)


def test_distribution_evaluators(spark):
    """normalDistribution/uniformDistribution + density/
    cumulativeProbability vs python math (erf via the published
    Abramowitz-Stegun 7.1.26 approximation, tol 1e-6)."""
    import math

    df = spark.range(1)

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    for x in (-2.0, -0.5, 0.0, 0.7, 1.5, 3.0):
        got = ev(f"cumulativeProbability(normalDistribution(0, 1), {x})")
        exp = 0.5 * (1.0 + math.erf(x / math.sqrt(2)))
        assert abs(got - exp) < 1e-6, x
        gotd = ev(f"density(normalDistribution(0, 1), {x})")
        expd = math.exp(-x * x / 2) / math.sqrt(2 * math.pi)
        assert abs(gotd - expd) < 1e-9, x
    # shifted/scaled normal
    got = ev("cumulativeProbability(normalDistribution(10, 2), 12)")
    exp = 0.5 * (1.0 + math.erf(1 / math.sqrt(2)))
    assert abs(got - exp) < 1e-6
    # uniform
    assert ev("density(uniformDistribution(2, 6), 3)") == 0.25
    assert ev("density(uniformDistribution(2, 6), 7)") == 0.0
    assert ev("cumulativeProbability(uniformDistribution(2, 6), 4)") == 0.5
    assert ev("cumulativeProbability(uniformDistribution(2, 6), 9)") == 1.0


def test_more_evaluators_round4b(spark):
    """expMovingAvg, rank, convert, eor, val, null, binomial/poisson
    pmf — vs python math."""
    import math

    df = spark.createDataFrame(
        [([2.0, 4.0, 6.0, 8.0, 12.0, 14.0, 16.0, 18.0, 20.0],)],
        "x array<double>")

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    # EMA, window 3, alpha = 0.5: seed = mean(2,4,6) = 4
    x = [2.0, 4.0, 6.0, 8.0, 12.0, 14.0, 16.0, 18.0, 20.0]
    ema = [sum(x[:3]) / 3]
    for v in x[3:]:
        ema.append(0.5 * v + 0.5 * ema[-1])
    got = ev("expMovingAvg(x, 3)")
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, ema))
    assert ev("rank(array(10, 20, 20, 30))") == [1.0, 2.5, 2.5, 4.0]
    assert abs(ev('convert("miles", "kilometers", 10)') - 16.09344) < 1e-9
    assert abs(ev('convert("inches", "centimeters", 2)') - 5.08) < 1e-9
    assert ev("eor(gt(2, 1), gt(1, 2))") is True
    assert ev("eor(gt(2, 1), gt(3, 2))") is False
    assert ev("val(7)") == 7
    assert ev("null()") is None
    # binomial pmf: C(10,3) 0.5^10
    got = ev("probability(binomialDistribution(10, 0.5), 3)")
    assert abs(got - 120 * 0.5 ** 10) < 1e-9
    # poisson pmf: e^-4 4^2/2!
    got = ev("probability(poissonDistribution(4), 2)")
    assert abs(got - math.exp(-4) * 16 / 2) < 1e-9


def test_conv_delay_describe_emd(spark):
    import numpy as np

    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [0.0, 1.0, 0.5],
          [4.0, 1.0, 7.0, 2.0], [0.1, 0.2, 0.3, 0.4],
          [0.4, 0.3, 0.2, 0.1])],
        "a array<double>, b array<double>, x array<double>, "
        "p array<double>, q array<double>")

    def ev(expr):
        return df.select(
            compile_evaluator(parse_expression(expr)).alias("v")
        ).collect()[0]["v"]

    assert np.allclose(ev("conv(a, b)"),
                       np.convolve([1, 2, 3], [0, 1, 0.5]))
    d = ev("describe(x)")
    xa = np.array([4.0, 1.0, 7.0, 2.0])
    assert d["N"] == 4 and d["min"] == 1.0 and d["max"] == 7.0
    assert abs(d["mean"] - xa.mean()) < 1e-12
    assert abs(d["var"] - xa.var(ddof=1)) < 1e-12
    # EMD: sum of |cumsum difference|
    pa, qa = np.array([0.1, 0.2, 0.3, 0.4]), np.array([0.4, 0.3, 0.2, 0.1])
    emd = np.abs(np.cumsum(pa - qa)).sum()
    assert abs(ev("earthMovers(p, q)") - emd) < 1e-12


def test_significant_terms_stream(spark):
    """SignificantTermsQParserPlugin.java:206 scoring: a term
    concentrated in the foreground docset scores above a uniformly
    common term; score = log(fg) * (log((N+1)/(df+1)) + 1)."""
    import math

    from lucene_solr_spark.streaming.expressions import StreamFactory

    rows = []
    for i in range(40):
        cls = "en" if i % 2 == 0 else "de"
        words = ["common"] * 2 + (["signal"] if cls == "en" else ["rausch"])
        rows.append((i, cls, " ".join(words)))
    df = spark.createDataFrame(rows, "id long, lang string, text string")
    sf = StreamFactory({"docs": df})
    out = sf.compile('significantTerms(docs, q="lang:en", field="text", '
                     'limit=5, minDocFreq=2, maxDocFreq=100)').collect()
    by_term = {r["term"]: r for r in out}
    assert "signal" in by_term
    sig = by_term["signal"]
    assert sig["foreground"] == 20 and sig["docFreq"] == 20
    want = math.log(20) * (math.log(41 / 21) + 1.0)
    assert abs(sig["score"] - want) < 1e-4
    # 'common' appears everywhere: lower significance than 'signal'
    assert by_term["common"]["score"] < sig["score"]
    # gate rule matches the reference (:166-180): values < 1.0 are
    # fractions of numDocs, >= 1.0 absolute — so maxDocFreq=1 means
    # "at most one doc" and excludes everything here
    none = sf.compile('significantTerms(docs, q="lang:en", '
                      'field="text", maxDocFreq=1)').collect()
    assert none == []


def test_train_stream(spark):
    """train() — TextLogitStream role: IGain feature pick + full-batch
    logistic iterations, error decreasing on separable data."""
    from lucene_solr_spark.streaming.expressions import StreamFactory

    rows = []
    for i in range(30):
        pos = i % 2 == 0
        text = ("spark query engine" if pos else "paint brush sill")
        rows.append((i, 1 if pos else 0, text))
    df = spark.createDataFrame(rows, "id long, label int, text string")
    sf = StreamFactory({"train_set": df})
    out = sf.compile('train(train_set, field="text", outcome="label", '
                     'positiveLabel=1, maxIterations=6, numTerms=3)'
                     ).collect()
    assert len(out) == 6
    assert [r["iteration"] for r in out] == [1, 2, 3, 4, 5, 6]
    assert out[-1]["error"] < out[0]["error"]


def test_eval_stream(spark):
    """eval(stream) — EvalStream.java: the first tuple's expr_s field
    is itself a streaming expression, compiled and executed."""
    from lucene_solr_spark.streaming.expressions import StreamFactory

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "id long, x double")
    exprs = spark.createDataFrame(
        [('search(t, q="*:*", fl="id,x", sort="id desc", rows=3)',)],
        "expr_s string")
    sf = StreamFactory({"t": df, "saved": exprs})
    out = sf.compile("eval(search(saved, q=\"*:*\", fl=\"expr_s\"))")
    assert [r["id"] for r in out.collect()] == [9, 8, 7]


def test_model_stream(spark):
    """model(collection, id=...) — ModelStream.java: latest stored
    iteration of a named trained model."""
    from lucene_solr_spark.streaming.expressions import StreamFactory

    rows = [("m1", 1, 0.5), ("m1", 3, 0.1), ("m1", 2, 0.3),
            ("m2", 9, 0.9)]
    df = spark.createDataFrame(rows, "name_s string, iteration_i int, "
                                     "error double")
    sf = StreamFactory({"models": df})
    out = sf.compile('model(models, id="m1")').collect()
    assert len(out) == 1
    assert out[0]["iteration_i"] == 3 and abs(out[0]["error"] - 0.1) < 1e-9
