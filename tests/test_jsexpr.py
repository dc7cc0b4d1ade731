"""Lucene expressions module (JavascriptCompiler.java + Javascript.g):
the JS-dialect expression compiler to a Spark Column. Each expression
is checked against a plain-Python evaluation of the same grammar
semantics (doubles everywhere, booleans as 1.0/0.0, bit ops on the
long pattern)."""

import math

import pytest

from lucene_solr_spark.functions.jsexpr import JSParseError, compile_js

ROWS = [
    {"a": 3.0, "b": -2.0, "pop": 9.0, "score": 0.5},
    {"a": 0.0, "b": 7.5, "pop": 100.0, "score": 2.25},
    {"a": -1.25, "b": 2.0, "pop": 1.0, "score": 0.0},
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "a double, b double, pop double, score double")


def _py(expr_fn):
    return [expr_fn(**r) for r in ROWS]


def _spark(df, expr, bindings=None):
    out = df.select(compile_js(expr, bindings).alias("v")).collect()
    return [r["v"] for r in out]


CASES = [
    ("1 + 2 * 3 - 4 / 8", lambda **r: 1 + 2 * 3 - 4 / 8),
    ("a + b * 2", lambda a, b, **r: a + b * 2),
    ("-a + +b", lambda a, b, **r: -a + b),
    ("(a + b) * (a - b)", lambda a, b, **r: (a + b) * (a - b)),
    ("a > b ? a : b", lambda a, b, **r: a if a > b else b),
    ("a > 0 && b > 0", lambda a, b, **r: 1.0 if a > 0 and b > 0 else 0.0),
    ("a > 0 || b > 0", lambda a, b, **r: 1.0 if a > 0 or b > 0 else 0.0),
    ("!(a == 0)", lambda a, **r: 0.0 if a == 0 else 1.0),
    ("a != 0", lambda a, **r: 1.0 if a != 0 else 0.0),
    ("a <= b", lambda a, b, **r: 1.0 if a <= b else 0.0),
    ("sqrt(pop) * score", lambda pop, score, **r: math.sqrt(pop) * score),
    ("max(a, b) + min(a, b)", lambda a, b, **r: max(a, b) + min(a, b)),
    ("pow(2, 10)", lambda **r: 1024.0),
    ("ln(exp(1))", lambda **r: 1.0),
    ("log10(100)", lambda **r: 2.0),
    ("logn(2, 8)", lambda **r: 3.0),
    ("abs(b) % 3", lambda b, **r: abs(b) % 3),
    ("atan2(a, 1)", lambda a, **r: math.atan2(a, 1)),
    ("floor(score) + ceil(score)",
     lambda score, **r: math.floor(score) + math.ceil(score)),
    ("0x10 + 010 + 0o7", lambda **r: 16.0 + 8.0 + 7.0),
    ("6 << 1", lambda **r: 12.0),
    ("13 >> 2", lambda **r: 3.0),
    ("12 & 10", lambda **r: 8.0),
    ("12 | 3", lambda **r: 15.0),
    ("12 ^ 10", lambda **r: 6.0),
    ("~5", lambda **r: -6.0),
    ("1e3 + .5", lambda **r: 1000.5),
]


@pytest.mark.parametrize("expr,fn", CASES, ids=[c[0] for c in CASES])
def test_expression_matches_python(df, expr, fn):
    got = _spark(df, expr)
    exp = _py(fn)
    assert got == pytest.approx(exp, rel=1e-12, abs=1e-12), expr


def test_bindings_override_columns(df, spark):
    from pyspark.sql import functions as F

    got = _spark(df, "sqrt(pop) * _score",
                 bindings={"_score": F.col("score") * 2})
    exp = [math.sqrt(r["pop"]) * r["score"] * 2 for r in ROWS]
    assert got == pytest.approx(exp)


def test_haversin_meters(df):
    # Paris -> London great-circle distance ~343.5 km
    got = _spark(df, "haversin(48.8566, 2.3522, 51.5074, -0.1278)")[0]
    assert got == pytest.approx(343_556, rel=0.01)


def test_parse_errors():
    for bad in ["", "1 +", "foo(1)", "max(1)", "(1", "1 2"]:
        with pytest.raises(JSParseError):
            compile_js(bad)


def test_stays_jvm_side(df):
    """The compiled Column is pure Catalyst — no Python UDF in the
    plan (the whole point of the DoubleValuesSource rendering)."""
    plan = df.select(compile_js("sqrt(pop) * score + (a > b ? 1 : 0)")
                     .alias("v"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
