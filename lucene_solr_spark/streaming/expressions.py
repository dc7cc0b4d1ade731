"""Solr streaming expressions compiled to Spark DataFrames.

Re-expresses the core of Solr's streaming-expression language
(solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/*.java and
eval/*.java): the expression text parses into the same
function-tree shape StreamExpressionParser produces
(io/stream/expr/StreamExpressionParser.java), and each stream function
compiles to the DataFrame operator with the same semantics, evaluated
lazily by Catalyst instead of tuple-at-a-time iterators:

  stream source     reference (io/stream/)         Spark rendering
  -----------------------------------------------------------------
  search(...)       SearchStream / CloudSolrStream  table scan (+ fq
                                                    filters, fl
                                                    projection, sort)
  -----------------------------------------------------------------
  decorators
  select(...)       SelectStream                    select + aliases +
                                                    evaluator columns
  innerJoin         InnerJoinStream                 join(..., "inner")
  leftOuterJoin     LeftOuterJoinStream             join(..., "left")
  hashJoin          HashJoinStream                  broadcast join
  rollup(...)       RollupStream                    groupBy().agg()
  facet(...)        FacetStream                     groupBy().agg()
  unique(...)       UniqueStream                    dropDuplicates(over)
  top(...)          RankStream                      orderBy().limit(n)
  sort(...)         SortStream                      orderBy()
  merge(...)        MergeStream                     unionByName + sort
  having(...)       HavingStream                    where(evaluator)
  nodes(...)        io/graph/GatherNodesStream      frontier-join BFS
  shortestPath(...) io/graph/ShortestPathStream     level-sync BFS w/
                                                    path accumulation
  -----------------------------------------------------------------
  metrics: sum/min/max/avg/count  (io/stream/metrics/*.java)
  evaluators: add sub mult div abs if gt gteq lt lteq eq and or not
              raw values and field refs (io/eval/*Evaluator.java)

Collections resolve through a caller-supplied ``tables`` mapping
(collection name -> DataFrame), the role of the SolrClientCache.
``q``/``fq`` accept ``field:value``, ``field:[a TO b]`` and ``*:*``
(the subset FacetStream/SearchStream pass through to the /select
handler); richer full-text q strings belong to the engine's searchers.
"""

from __future__ import annotations

import math
import re
from typing import Callable

from pyspark.sql import DataFrame, functions as F


# -- expression parsing (StreamExpressionParser.java role) ---------------

class ExprNode:
    """function(args...) node; leaves are strings/numbers."""

    __slots__ = ("name", "args", "kwargs")

    def __init__(self, name, args, kwargs):
        self.name, self.args, self.kwargs = name, args, kwargs

    def __repr__(self):  # pragma: no cover - debug aid
        parts = [repr(a) for a in self.args]
        parts += [f"{k}={v!r}" for k, v in self.kwargs.items()]
        return f"{self.name}({', '.join(parts)})"


_TOKEN = re.compile(r'''\s*(
      "(?:[^"\\]|\\.)*"      # double-quoted string
    | '(?:[^'\\]|\\.)*'      # single-quoted string
    | [(),=]
    | [^\s(),=]+             # bare word / number / identifier
)''', re.VERBOSE)


def parse_expression(s: str) -> ExprNode:
    toks = _TOKEN.findall(s)
    node, i = _parse_node(toks, 0)
    if i != len(toks):
        raise ValueError(f"trailing tokens: {toks[i:]}")
    return node


class Quoted(str):
    """A string argument that was quoted in the source expression —
    the reference's StreamExpressionValue keeps this distinction so
    evaluators can tell a string LITERAL from a field reference
    (io/stream/expr/StreamExpressionParser.java). Subclasses str so
    every existing consumer (kwargs, select specs) is unaffected."""

    __slots__ = ()


def _unquote(t: str) -> str:
    if len(t) >= 2 and t[0] in "\"'" and t[-1] == t[0]:
        return Quoted(re.sub(r"\\(.)", r"\1", t[1:-1]))
    return t


def _parse_node(toks, i):
    name = toks[i]
    if i + 1 >= len(toks) or toks[i + 1] != "(":
        raise ValueError(f"expected ( after {name}")
    i += 2
    args, kwargs = [], {}
    while toks[i] != ")":
        # key=value | nested(...) | bare value
        if i + 1 < len(toks) and toks[i + 1] == "=":
            key = _unquote(toks[i])
            if i + 3 < len(toks) and toks[i + 3] == "(":
                val, i = _parse_node(toks, i + 2)
            else:
                val, i = _unquote(toks[i + 2]), i + 3
            kwargs[key] = val
        elif i + 1 < len(toks) and toks[i + 1] == "(":
            val, i = _parse_node(toks, i)
            args.append(val)
        else:
            args.append(_unquote(toks[i]))
            i += 1
        if toks[i] == ",":
            i += 1
    return ExprNode(name, args, kwargs), i + 1


# -- evaluators (io/eval/*Evaluator.java) --------------------------------

_EVALS: dict[str, Callable] = {
    "add": lambda a: _fold(a, lambda x, y: x + y),
    "sub": lambda a: _fold(a, lambda x, y: x - y),
    "mult": lambda a: _fold(a, lambda x, y: x * y),
    "div": lambda a: _fold(a, lambda x, y: x / y),
    "abs": lambda a: F.abs(a[0]),
    "if": lambda a: F.when(a[0], a[1]).otherwise(a[2]),
    "gt": lambda a: a[0] > a[1],
    "gteq": lambda a: a[0] >= a[1],
    "lt": lambda a: a[0] < a[1],
    "lteq": lambda a: a[0] <= a[1],
    "eq": lambda a: a[0] == a[1],
    "and": lambda a: _fold(a, lambda x, y: x & y),
    "or": lambda a: _fold(a, lambda x, y: x | y),
    "not": lambda a: ~a[0],
    # math evaluator zoo (io/eval/ModuloEvaluator.java, PowerEvaluator,
    # SquareRootEvaluator, CubedRootEvaluator, NaturalLogEvaluator,
    # Log10Evaluator, Sine/Cosine/Tangent + Arc*/Hyperbolic* families,
    # CeilingEvaluator, FloorEvaluator)
    "mod": lambda a: a[0] % a[1],
    "pow": lambda a: F.pow(a[0], a[1]),
    "sqrt": lambda a: F.sqrt(a[0]),
    "cbrt": lambda a: F.cbrt(a[0]),
    "log": lambda a: F.log(a[0]),  # Solr's log() is the natural log
    "log10": lambda a: F.log10(a[0]),
    "sin": lambda a: F.sin(a[0]),
    "cos": lambda a: F.cos(a[0]),
    "tan": lambda a: F.tan(a[0]),
    "asin": lambda a: F.asin(a[0]),
    "acos": lambda a: F.acos(a[0]),
    "atan": lambda a: F.atan(a[0]),
    "sinh": lambda a: F.sinh(a[0]),
    "cosh": lambda a: F.cosh(a[0]),
    "tanh": lambda a: F.tanh(a[0]),
    "ceiling": lambda a: F.ceil(a[0]),
    "floor": lambda a: F.floor(a[0]),
    # vector/array evaluator family (Lang.java registered names →
    # io/eval classes; all pure JVM higher-order array functions):
    # ArrayEvaluator, ReverseEvaluator, LengthEvaluator,
    # ValueAtEvaluator (0-based), SequenceEvaluator,
    # DotProductEvaluator, CosineSimilarityEvaluator, EBE*Evaluator,
    # Euclidean/Manhattan/Canberra/ChebyshevEvaluator, L1NormEvaluator,
    # MeanEvaluator, ScaleEvaluator, NormalizeSumEvaluator,
    # MinMaxScaleEvaluator, CoalesceEvaluator, PrecisionEvaluator.
    "array": lambda a: F.array(*a),
    "rev": lambda a: F.reverse(a[0]),
    "length": lambda a: F.size(a[0]),
    "valueat": lambda a: F.get(a[0], a[1].cast("int")),
    "sequence": lambda a: F.sequence(
        a[1].cast("long"),
        (a[1] + (a[0] - 1) * a[2]).cast("long"),
        a[2].cast("long")),
    "dotproduct": lambda a: _dot(a[0], a[1]),
    "cosinesimilarity": lambda a: _dot(a[0], a[1]) / (
        F.sqrt(_dot(a[0], a[0])) * F.sqrt(_dot(a[1], a[1]))),
    "ebeadd": lambda a: F.zip_with(a[0], a[1], lambda x, y: x + y),
    "ebesubtract": lambda a: F.zip_with(a[0], a[1], lambda x, y: x - y),
    "ebemultiply": lambda a: F.zip_with(a[0], a[1], lambda x, y: x * y),
    "ebedivide": lambda a: F.zip_with(a[0], a[1], lambda x, y: x / y),
    "euclidean": lambda a: F.sqrt(_asum(
        F.zip_with(a[0], a[1], lambda x, y: (x - y) * (x - y)))),
    "manhattan": lambda a: _asum(
        F.zip_with(a[0], a[1], lambda x, y: F.abs(x - y))),
    "canberra": lambda a: _asum(F.zip_with(
        a[0], a[1],
        lambda x, y: F.abs(x - y) / (F.abs(x) + F.abs(y)))),
    "chebyshev": lambda a: F.array_max(
        F.zip_with(a[0], a[1], lambda x, y: F.abs(x - y))),
    "l1norm": lambda a: _asum(F.transform(a[0], F.abs)),
    "mean": lambda a: _asum(a[0]) / F.size(a[0]),
    "scale": lambda a: F.transform(a[1], lambda x: a[0] * x),
    "normalizesum": lambda a: F.transform(
        a[0], lambda x: x / _asum(a[0])),
    "minmaxscale": lambda a: F.transform(
        a[0], lambda x: (x - F.array_min(a[0]))
        / (F.array_max(a[0]) - F.array_min(a[0]))),
    "coalesce": lambda a: F.coalesce(*a),
    # string evaluator family (io/eval/UpperEvaluator.java,
    # LowerEvaluator, TrimEvaluator, ConcatEvaluator)
    "upper": lambda a: F.upper(a[0]),
    "lower": lambda a: F.lower(a[0]),
    "trim": lambda a: F.trim(a[0]),
    "concat": lambda a: F.concat(*a),
    # temporal evaluator family (io/eval/TemporalEvaluatorYear.java
    # and siblings — Lang.java registers year/month/day/dayOfYear/
    # hour/minute/second/epoch/week/quarter over a date/timestamp)
    "year": lambda a: F.year(a[0]),
    "month": lambda a: F.month(a[0]),
    "day": lambda a: F.dayofmonth(a[0]),
    "dayofyear": lambda a: F.dayofyear(a[0]),
    "hour": lambda a: F.hour(a[0]),
    "minute": lambda a: F.minute(a[0]),
    "second": lambda a: F.second(a[0]),
    "week": lambda a: F.weekofyear(a[0]),
    "quarter": lambda a: F.quarter(a[0]),
    "epoch": lambda a: F.unix_timestamp(a[0]) * 1000,  # millis, like Date.getTime
    # statistical array evaluators (io/eval/VarianceEvaluator.java,
    # StandardDeviationEvaluator — commons-math SAMPLE variance, n-1)
    "var": lambda a: _sample_var(a[0]),
    "stddev": lambda a: F.sqrt(_sample_var(a[0])),
    # numeric/array evaluator widening (io/eval/*Evaluator.java,
    # Lang.java registrations): ceil alias, SumSqEvaluator, L2Norm,
    # LInfNorm, UnitizeEvaluator, StandardizeEvaluator, ModeEvaluator,
    # PercentileEvaluator (commons-math legacy estimation),
    # AddAll/Append/Ascending, IndexOf (ValueAt inverse), Copy/Range,
    # DiffEvaluator (series difference, default lag 1), MovingAverage,
    # MovingMedian, Zeros/Ones, Factorial/BinomialCoefficient,
    # SumDifference/MeanDifference, DistanceEvaluator (euclidean
    # default), uuid.
    "ceil": lambda a: F.ceil(a[0]),
    "sumsq": lambda a: _asum(F.transform(a[0], lambda x: x * x)),
    "l2norm": lambda a: F.sqrt(_asum(F.transform(a[0], lambda x: x * x))),
    "linfnorm": lambda a: F.array_max(F.transform(a[0], F.abs)),
    "unitize": lambda a: F.transform(
        a[0], lambda x: x / F.sqrt(_asum(
            F.transform(a[0], lambda y: y * y)))),
    "standardize": lambda a: F.transform(
        a[0], lambda x: (x - _asum(a[0]) / F.size(a[0]))
        / F.sqrt(_sample_var(a[0]))),
    "mode": lambda a: F.array_max(F.transform(
        F.array_distinct(a[0]),
        lambda v: F.struct(
            F.size(F.filter(a[0], lambda x: x == v)).alias("c"),
            v.alias("v"))))["v"],
    "percentile": lambda a: _percentile(a[0], a[1]),
    "addall": lambda a: F.concat(*a),
    "append": lambda a: F.concat(a[0], F.array(*a[1:])),
    "asc": lambda a: F.sort_array(a[0]),
    "indexof": lambda a: F.array_position(a[0], a[1]) - 1,
    "copyof": lambda a: (F.slice(a[0], 1, a[1].cast("int"))
                         if len(a) > 1 else a[0]),
    "copyofrange": lambda a: F.slice(
        a[0], a[1].cast("int") + 1, (a[2] - a[1]).cast("int")),
    "diff": lambda a: _series_diff(a[0], a[1] if len(a) > 1 else F.lit(1)),
    "movingavg": lambda a: _moving(a[0], a[1], _arr_mean),
    "movingmedian": lambda a: _moving(a[0], a[1], _arr_median),
    "zeros": lambda a: F.array_repeat(F.lit(0.0), a[0].cast("int")),
    "ones": lambda a: F.array_repeat(F.lit(1.0), a[0].cast("int")),
    "factorial": lambda a: F.factorial(a[0].cast("int")).cast("double"),
    "binomialcoefficient": lambda a: F.round(
        F.exp(_log_fact(a[0]) - _log_fact(a[1]) - _log_fact(a[0] - a[1]))
    ).cast("double"),
    "sumdifference": lambda a: _asum(
        F.zip_with(a[0], a[1], lambda x, y: x - y)),
    "meandifference": lambda a: _asum(
        F.zip_with(a[0], a[1], lambda x, y: x - y)) / F.size(a[0]),
    "distance": lambda a: F.sqrt(_asum(
        F.zip_with(a[0], a[1], lambda x, y: (x - y) * (x - y)))),
    "uuid": lambda a: F.expr("uuid()"),
    # RegressionEvaluator.java / PredictEvaluator.java: simple OLS over
    # two numeric arrays -> tuple(slope, intercept, rSquared); predict
    # applies the fitted model to a scalar or array
    "regress": lambda a: _regress(a[0], a[1]),
    "predict": lambda a: _predict(a[0], a[1]),
    # probability-distribution family (io/eval/NormalDistribution
    # Evaluator.java, UniformRealDistributionEvaluator, Density
    # Evaluator, CumulativeProbabilityEvaluator): a distribution is a
    # tagged struct; CDF of the normal uses the Abramowitz-Stegun
    # 7.1.26 erf approximation (|err| < 1.5e-7) as pure Column math
    "normaldistribution": lambda a: F.struct(
        F.lit("normal").alias("type"),
        a[0].cast("double").alias("p1"), a[1].cast("double").alias("p2")),
    "uniformdistribution": lambda a: F.struct(
        F.lit("uniform").alias("type"),
        a[0].cast("double").alias("p1"), a[1].cast("double").alias("p2")),
    "density": lambda a: _density(a[0], a[1].cast("double")),
    "cumulativeprobability": lambda a: _cum_prob(
        a[0], a[1].cast("double")),
    # discrete distributions + pmf (BinomialDistributionEvaluator,
    # PoissonDistributionEvaluator, ProbabilityEvaluator)
    "binomialdistribution": lambda a: F.struct(
        F.lit("binomial").alias("type"),
        a[0].cast("double").alias("p1"), a[1].cast("double").alias("p2")),
    "poissondistribution": lambda a: F.struct(
        F.lit("poisson").alias("type"),
        a[0].cast("double").alias("p1"), F.lit(0.0).alias("p2")),
    "probability": lambda a: _pmf(a[0], a[1].cast("double")),
    # EorEvaluator (exclusive or), RawValueEvaluator (val), NullEvaluator
    "eor": lambda a: a[0] != a[1],
    "val": lambda a: a[0],
    "null": lambda a: F.lit(None),
    "colat": lambda a: F.transform(
        a[0], lambda row: F.get(row, a[1].cast("int"))),
    # ExponentialMovingAverageEvaluator: seed = SMA of the first
    # window, then ema_i = alpha*x_i + (1-alpha)*ema_{i-1},
    # alpha = 2/(window+1); output length n - window + 1
    "expmovingavg": lambda a: _exp_moving_avg(a[0], a[1]),
    # RankEvaluator (commons-math NaturalRanking, ties averaged)
    "rank": lambda a: _rank(a[0]),
    # ConversionEvaluator.java:32 length units
    "convert": lambda a: _convert(a[0], a[1], a[2]),
    # ConvolutionEvaluator (full discrete convolution),
    # FindDelayEvaluator (argmax of cross-correlation),
    # DescribeEvaluator (DescriptiveStatistics summary struct),
    # EarthMoversEvaluator (1-D EMD = Σ |cumsum difference|)
    "conv": lambda a: _conv(a[0], a[1]),
    "finddelay": lambda a: _find_delay(a[0], a[1]),
    "describe": lambda a: _describe(a[0]),
    "earthmovers": lambda a: _earth_movers(a[0], a[1]),
    # matrix evaluator family (io/eval/MatrixEvaluator.java,
    # TransposeEvaluator, MatrixMultiplyEvaluator, RowAt/ColumnAt,
    # Row/ColumnCount, SumRows/SumColumns, GrandSum, Scalar*Evaluator,
    # CovarianceEvaluator, CorrelationEvaluator — Lang.java:120-234).
    # A matrix is an array<array<double>> column; everything below is
    # pure-JVM higher-order array functions, no UDF.
    "matrix": lambda a: F.array(*a),
    "transpose": lambda a: _transpose(a[0]),
    "matrixmult": lambda a: _matmul(a[0], a[1]),
    "rowcount": lambda a: F.size(a[0]),
    "columncount": lambda a: F.size(F.get(a[0], 0)),
    "rowat": lambda a: F.get(a[0], a[1].cast("int")),
    "columnat": lambda a: F.transform(
        a[0], lambda row: F.get(row, a[1].cast("int"))),
    "sumrows": lambda a: F.transform(a[0], _asum),
    "sumcolumns": lambda a: F.transform(_transpose(a[0]), _asum),
    "grandsum": lambda a: _asum(F.transform(a[0], _asum)),
    "scalaradd": lambda a: _scalar_op(a[1], a[0], lambda x, sc: x + sc),
    "scalarsubtract": lambda a: _scalar_op(
        a[1], a[0], lambda x, sc: x - sc),
    "scalarmultiply": lambda a: _scalar_op(
        a[1], a[0], lambda x, sc: x * sc),
    "scalardivide": lambda a: _scalar_op(a[1], a[0], lambda x, sc: x / sc),
    # commons-math Covariance (bias-corrected, n-1) and Pearson
    # correlation over two numeric arrays
    "cov": lambda a: _cov(a[0], a[1]),
    "corr": lambda a: (_cov(a[0], a[1])
                       / (F.sqrt(_sample_var(a[0]))
                          * F.sqrt(_sample_var(a[1])))),
}


#: metres per unit (ConversionEvaluator.java LENGTH_CONSTANT set)
_UNIT_METERS = {
    "inches": 0.0254, "feet": 0.3048, "yards": 0.9144,
    "miles": 1609.344, "millimeters": 0.001, "centimeters": 0.01,
    "meters": 1.0, "kilometers": 1000.0,
}


def _convert(frm, to, v):
    # unit names arrive as quoted literals -> Column of string; resolve
    # driver-side when literal, else build a CASE ladder
    import pyspark.sql.column as _c  # noqa: F401

    def factor_expr(col):
        expr = F.lit(None).cast("double")
        for name, m in _UNIT_METERS.items():
            expr = F.when(col == name, F.lit(m)).otherwise(expr)
        return expr

    return v.cast("double") * factor_expr(frm) / factor_expr(to)


def _conv(a, b):
    """Full convolution, out[k] = Σ_i a[i] * b[k - i],
    k ∈ [0, n+m-2] (ConvolutionEvaluator / commons-math
    MathArrays.convolve)."""
    n, m = F.size(a), F.size(b)
    return F.transform(
        F.sequence(F.lit(0), n + m - 2),
        lambda k: F.aggregate(
            F.sequence(F.greatest(F.lit(0), k - m + 1),
                       F.least(n - 1, k)),
            F.lit(0.0),
            lambda acc, i: acc + F.element_at(a, i + 1).cast("double")
            * F.element_at(b, k - i + 1).cast("double")))


def _find_delay(a, b):
    """FindDelayEvaluator: delay of b relative to a = (argmax of the
    full cross-correlation) - len(b) + 1; correlation = conv(a,
    reverse(b))."""
    xc = _conv(a, F.reverse(b))
    mx = F.array_max(xc)
    pos = F.array_position(xc, mx).cast("long")  # 1-based first argmax
    return (F.size(b).cast("long") - pos) * F.lit(-1) + 0


def _describe(arr):
    n = F.size(arr)
    mean = _asum(arr) / n
    var = _sample_var(arr)
    return F.struct(
        n.cast("double").alias("N"),
        F.array_min(arr).cast("double").alias("min"),
        F.array_max(arr).cast("double").alias("max"),
        mean.alias("mean"),
        _asum(arr).alias("sum"),
        var.alias("var"),
        F.sqrt(var).alias("stdev"),
        _percentile(arr, F.lit(50)).alias("50thpercentile"))


def _earth_movers(a, b):
    """1-D earth mover's distance between two same-length
    distributions: Σ |prefix-sum difference| (the closed form the
    commons-math EarthMoversDistance computes)."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y)
    n = F.size(a)
    # prefix sums via aggregate building an array, then Σ |...| of all
    # but the final element (EMD_n-1 moves; last prefix is total mass
    # difference, 0 for true distributions — commons-math sums all)
    prefixes = F.aggregate(
        diff, F.array().cast("array<double>"),
        lambda acc, x: F.concat(acc, F.array(
            F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x)))
    return _asum(F.transform(prefixes, F.abs))


def _exp_moving_avg(arr, w):
    wi = w.cast("int")
    alpha = 2.0 / (w.cast("double") + 1.0)
    sma = _asum(F.slice(arr, 1, wi)) / w.cast("double")
    rest = F.slice(arr, wi + 1, F.size(arr) - wi)
    return F.aggregate(
        rest, F.array(sma),
        lambda acc, x: F.concat(acc, F.array(
            alpha * x.cast("double")
            + (1.0 - alpha) * F.element_at(acc, -1))))


def _rank(arr):
    """Fractional ranks, ties averaged (NaturalRanking TiesStrategy
    .AVERAGE): rank(x) = #{y < x} + (#{y == x} + 1) / 2."""
    return F.transform(arr, lambda x: (
        F.size(F.filter(arr, lambda y: y < x)).cast("double")
        + (F.size(F.filter(arr, lambda y: y == x)).cast("double") + 1.0)
        / 2.0))


def _pmf(dist, x):
    n, p = dist["p1"], dist["p2"]
    log_binom = (_log_fact(n) - _log_fact(x) - _log_fact(n - x)
                 + x * F.log(p) + (n - x) * F.log(1.0 - p))
    binomial = F.exp(log_binom)
    poisson = F.exp(-n + x * F.log(n) - _log_fact(x))
    return F.when(dist["type"] == "binomial", binomial).otherwise(poisson)


_SQRT_2PI = 2.5066282746310002


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation of erf
    (published constants; |error| < 1.5e-7), sign-symmetric."""
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ax = F.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = (t * (0.254829592
                 + t * (-0.284496736
                        + t * (1.421413741
                               + t * (-1.453152027
                                      + t * 1.061405429)))))
    return sign * (1.0 - poly * F.exp(-ax * ax))


def _density(dist, x):
    mean, p2 = dist["p1"], dist["p2"]
    normal = (F.exp(-(x - mean) * (x - mean) / (2.0 * p2 * p2))
              / (p2 * _SQRT_2PI))
    uniform = F.when((x >= mean) & (x <= p2),
                     1.0 / (p2 - mean)).otherwise(F.lit(0.0))
    return F.when(dist["type"] == "normal", normal).otherwise(uniform)


def _cum_prob(dist, x):
    mean, p2 = dist["p1"], dist["p2"]
    normal = 0.5 * (1.0 + _erf((x - mean)
                               / (p2 * 1.4142135623730951)))
    uniform = F.least(F.lit(1.0), F.greatest(
        F.lit(0.0), (x - mean) / (p2 - mean)))
    return F.when(dist["type"] == "normal", normal).otherwise(uniform)


def _regress(x, y):
    n = F.size(x).cast("double")
    mx = _asum(x) / n
    my = _asum(y) / n
    sxy = _asum(F.zip_with(x, y, lambda a_, b_: (a_ - mx) * (b_ - my)))
    sxx = _asum(F.transform(x, lambda a_: (a_ - mx) * (a_ - mx)))
    syy = _asum(F.transform(y, lambda b_: (b_ - my) * (b_ - my)))
    slope = sxy / sxx
    return F.struct(
        slope.alias("slope"),
        (my - slope * mx).alias("intercept"),
        ((sxy * sxy) / (sxx * syy)).alias("rSquared"))


def _predict(model, x):
    """Scalar predict (PredictEvaluator's number branch); for arrays
    Solr maps element-wise — compose with ebe ops/scale here, since a
    Column's runtime type is not visible at compile time."""
    return model["slope"] * x + model["intercept"]


def _arr_mean(arr):
    return _asum(arr) / F.size(arr)


def _arr_median(arr):
    srt = F.sort_array(arr)
    n = F.size(arr)
    mid = (n / 2).cast("int")
    return F.when(
        n % 2 == 1, F.element_at(srt, mid + 1).cast("double")
    ).otherwise(
        (F.element_at(srt, mid) + F.element_at(srt, mid + 1)) / 2.0)


def _moving(arr, w, stat):
    """Sliding-window statistic (MovingAverageEvaluator.java role):
    output length n - w + 1."""
    wi = w.cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - wi + 1),
        lambda i: stat(F.slice(arr, i, wi)))


def _series_diff(arr, lag):
    """a[i] - a[i-lag] for i in [lag, n) (DiffEvaluator's series
    difference; output length n - lag)."""
    lg = lag.cast("int")
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - lg),
        lambda i: F.element_at(arr, i + lg) - F.element_at(arr, i))


def _percentile(arr, p):
    """commons-math Percentile, LEGACY estimation (the Solr
    PercentileEvaluator default): pos = p*(n+1)/100 over the sorted
    array, linear interpolation, clamped to the extremes."""
    srt = F.sort_array(arr)
    n = F.size(arr)
    pos = p.cast("double") * (n + 1).cast("double") / 100.0
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    below = F.element_at(srt, F.greatest(lo, F.lit(1)))
    above = F.element_at(srt, F.least(lo + 1, n))
    return F.when(pos < 1.0, F.element_at(srt, 1).cast("double")) \
        .when(pos >= n.cast("double"), F.element_at(srt, n).cast("double")) \
        .otherwise(below + frac * (above - below))


def _log_fact(x):
    """log(x!) via Σ log(i) — exact enough for binomialCoefficient's
    rounded result at stream-expression scales."""
    xi = x.cast("int")
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(xi, F.lit(1))), F.lit(0.0),
        lambda acc, i: acc + F.log(i.cast("double")))


def _transpose(m):
    """array<array<double>> transpose: column i of every row."""
    return F.transform(
        F.sequence(F.lit(0), F.size(F.get(m, 0)) - 1),
        lambda i: F.transform(m, lambda row: F.get(row, i.cast("int"))))


def _matmul(a, b):
    """(A·B)[i][j] = dot(A row i, B column j) — B transposed once."""
    bt = _transpose(b)
    return F.transform(a, lambda row: F.transform(
        bt, lambda bcol: _dot(row, bcol)))


def _scalar_op(m, sc, op):
    """Scalar op over a MATRIX (Solr's Scalar*Evaluator matrix form;
    vectors use ebeAdd/scale)."""
    return F.transform(
        m, lambda row: F.transform(row, lambda x: op(x.cast("double"), sc)))


def _cov(x, y):
    n = F.size(x)
    mx = _asum(x) / n
    my = _asum(y) / n
    return _asum(F.zip_with(
        x, y, lambda a_, b_: (a_ - mx) * (b_ - my))) / (n - 1)


def _sample_var(arr):
    n = F.size(arr)
    mean = _asum(arr) / n
    return _asum(F.transform(arr, lambda x: (x - mean) * (x - mean))) / (n - 1)


def _asum(arr):
    """Σ over a numeric array column, double accumulator."""
    return F.aggregate(arr, F.lit(0.0),
                       lambda acc, x: acc + x.cast("double"))


def _dot(a, b):
    return _asum(F.zip_with(a, b, lambda x, y: x * y))


def _fold(cols, op):
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


_NUM = re.compile(r"^-?\d+(\.\d+)?$")


def compile_evaluator(node) -> "F.Column":
    """Expression leaf/tree -> Column (BooleanEvaluator /
    NumberEvaluator roles)."""
    if isinstance(node, Quoted):
        return F.lit(str(node))
    if isinstance(node, str):
        if _NUM.match(node):
            return F.lit(float(node) if "." in node else int(node))
        return F.col(node)
    if isinstance(node, (int, float)):
        return F.lit(node)
    if node.name in ("round", "precision"):
        # io/eval/RoundEvaluator.java / PrecisionEvaluator.java —
        # the decimal count is a literal, not a column
        prec = int(node.args[1]) if len(node.args) > 1 else 0
        return F.round(compile_evaluator(node.args[0]), prec)
    if node.name in ("sum", "min", "max", "avg", "count"):
        # reference to a rollup/facet METRIC OUTPUT field ("sum(x)"),
        # as HavingStream sees it tuple-side
        arg = node.args[0] if node.args else "*"
        return F.col(f"`{node.name}({arg})`")
    # Lang.java registers camelCase names (dotProduct, ebeAdd…); the
    # table is keyed lowercase so lookup is case-insensitive
    fn = _EVALS.get(node.name) or _EVALS.get(node.name.lower())
    if fn is None:
        raise ValueError(f"unknown evaluator {node.name}")
    return fn([compile_evaluator(a) for a in node.args])


# -- metrics (io/stream/metrics/*.java) ----------------------------------

def _metric(node: ExprNode):
    (arg,) = node.args or ("*",)
    name = node.name.lower()
    out_name = f"{name}({arg})"
    if name == "count":
        return (F.count(F.lit(1)) if arg == "*"
                else F.count(arg)).alias(out_name)
    agg = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}.get(name)
    if agg is None:
        raise ValueError(f"unknown metric {node.name}")
    return agg(arg).alias(out_name)


# -- the stream factory (io/stream/expr/StreamFactory.java role) ---------

class StreamFactory:
    """Compiles a streaming expression to a DataFrame.

    tables: collection name -> DataFrame (SolrClientCache role).
    """

    def __init__(self, tables: dict[str, DataFrame]):
        self.tables = tables

    def compile(self, expr: str | ExprNode) -> DataFrame:
        node = parse_expression(expr) if isinstance(expr, str) else expr
        return self._stream(node)

    # -- dispatch -------------------------------------------------------
    def _stream(self, node: ExprNode) -> DataFrame:
        fn = getattr(self, f"_s_{node.name}", None)
        if fn is None:
            raise ValueError(f"unknown stream function {node.name}")
        return fn(node)

    @staticmethod
    def _sort_cols(spec: str):
        cols = []
        for part in spec.split(","):
            bits = part.split()
            c = F.col(bits[0])
            cols.append(c.desc() if len(bits) > 1
                        and bits[1].lower() == "desc" else c.asc())
        return cols

    def _apply_q(self, df: DataFrame, q: str) -> DataFrame:
        """``field:value`` / ``field:[a TO b]`` / ``*:*`` filter — the
        subset SearchStream forwards verbatim as q/fq."""
        q = q.strip()
        if not q or q == "*:*":
            return df
        m = re.match(r"^(\w+):\[(\S+) TO (\S+)\]$", q)
        if m:
            f_, lo, hi = m.groups()
            c = F.col(f_)
            cond = F.lit(True)
            if lo != "*":
                cond = cond & (c >= _autocast(lo))
            if hi != "*":
                cond = cond & (c <= _autocast(hi))
            return df.where(cond)
        m = re.match(r"^(\w+):(\S+)$", q)
        if m:
            return df.where(F.col(m.group(1)) == _autocast(m.group(2)))
        raise ValueError(f"unsupported q syntax: {q!r}")

    # -- sources --------------------------------------------------------
    def _s_search(self, node: ExprNode) -> DataFrame:
        coll = node.args[0]
        df = self.tables.get(coll)
        if df is None:
            raise ValueError(f"unknown collection {coll}")
        for key in ("q", "fq"):
            if key in node.kwargs:
                df = self._apply_q(df, node.kwargs[key])
        if "fl" in node.kwargs:
            df = df.select(*[c.strip()
                             for c in node.kwargs["fl"].split(",")])
        if "sort" in node.kwargs:
            df = df.orderBy(*self._sort_cols(node.kwargs["sort"]))
        if "rows" in node.kwargs:
            df = df.limit(int(node.kwargs["rows"]))
        return df

    # -- decorators -----------------------------------------------------
    def _s_select(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        # re-join bare `x as y` arg triplets the tokenizer split up
        # (quoted "expr as alias" args arrive whole)
        raw, i = [], 1
        args = node.args
        while i < len(args):
            if (i + 2 < len(args) + 1 and i + 2 < len(args)
                    and args[i + 1] == "as"):
                left = args[i]
                left_s = (f"{left.name}({', '.join(map(str, left.args))})"
                          if isinstance(left, ExprNode) else str(left))
                raw.append(f"{left_s} as {args[i + 2]}")
                i += 3
            else:
                raw.append(args[i])
                i += 1
        cols = []
        for a in raw:
            if isinstance(a, ExprNode):
                cols.append(compile_evaluator(a))
                continue
            m = re.match(r"^(.*?)\s+as\s+(\w+)$", a)
            if m:
                src, alias = m.groups()
                src = src.strip()
                col = (compile_evaluator(parse_expression(src))
                       if "(" in src else F.col(src))
                cols.append(col.alias(alias))
            else:
                cols.append(F.col(a.strip()))
        return df.select(*cols)

    def _join(self, node: ExprNode, how: str, broadcast=False) -> DataFrame:
        left = self._stream(node.args[0])
        right = self._stream(node.args[1])
        on = [c.strip() for c in node.kwargs["on"].split(",")]
        if broadcast:
            right = F.broadcast(right)
        return left.join(right, on, how)

    def _s_innerJoin(self, node):
        return self._join(node, "inner")

    def _s_leftOuterJoin(self, node):
        return self._join(node, "left")

    def _s_hashJoin(self, node):
        # HashJoinStream reads the hashed stream fully into memory —
        # the broadcast-join analogue
        return self._join(node, "inner", broadcast=True)

    def _s_rollup(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        over = [c.strip() for c in node.kwargs["over"].split(",")]
        metrics = [_metric(a) for a in node.args[1:]]
        return df.groupBy(*over).agg(*metrics)

    def _s_facet(self, node: ExprNode) -> DataFrame:
        coll = node.args[0]
        df = self.tables.get(coll)
        if df is None:
            raise ValueError(f"unknown collection {coll}")
        if "q" in node.kwargs:
            df = self._apply_q(df, node.kwargs["q"])
        buckets = [c.strip() for c in node.kwargs["buckets"].split(",")]
        metrics = [_metric(a) for a in node.args[1:]]
        out = df.groupBy(*buckets).agg(*metrics)
        if "bucketSorts" in node.kwargs:
            out = out.orderBy(*self._sort_cols(node.kwargs["bucketSorts"]))
        if "bucketSizeLimit" in node.kwargs:
            out = out.limit(int(node.kwargs["bucketSizeLimit"]))
        return out

    def _s_unique(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        over = [c.strip() for c in node.kwargs["over"].split(",")]
        return df.dropDuplicates(over)

    def _s_top(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        n = int(node.kwargs["n"])
        return df.orderBy(*self._sort_cols(node.kwargs["sort"])).limit(n)

    def _s_sort(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        return df.orderBy(*self._sort_cols(node.kwargs["by"]))

    def _s_merge(self, node: ExprNode) -> DataFrame:
        streams = [self._stream(a) for a in node.args
                   if isinstance(a, ExprNode)]
        out = streams[0]
        for s in streams[1:]:
            out = out.unionByName(s)
        if "on" in node.kwargs:
            out = out.orderBy(*self._sort_cols(node.kwargs["on"]))
        return out

    def _s_having(self, node: ExprNode) -> DataFrame:
        df = self._stream(node.args[0])
        conds = [a for a in node.args[1:] if isinstance(a, ExprNode)]
        if len(conds) != 1:
            raise ValueError("having needs exactly one boolean evaluator")
        return df.where(compile_evaluator(conds[0]))

    # -- graph traversal (io/graph/*.java) -------------------------------
    def _s_nodes(self, node: ExprNode) -> DataFrame:
        """nodes(collection, <stream>, walk="node->src", gather="dst",
        maxLevels=N, trackTraversal=true|false, scatter="branches,leaves")
        — GatherNodesStream.java (registered as both `nodes` and
        `gatherNodes`, Lang.java). The incoming stream's `walk` left
        field feeds the collection's right field; gathered nodes come
        out of the `gather` field with a per-node incoming-edge count."""
        from .graph import gather_nodes

        edges = self.tables.get(node.args[0])
        if edges is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        roots = self._stream(node.args[1])
        walk_from, walk_to = (w.strip() for w in
                              node.kwargs["walk"].split("->"))
        scatter = node.kwargs.get("scatter", "leaves")
        return gather_nodes(
            edges,
            roots.select(F.col(walk_from).alias("node")),
            src=walk_to,
            dst=node.kwargs["gather"],
            levels=int(node.kwargs.get("maxLevels", 1)),
            track_traversal=(
                node.kwargs.get("trackTraversal", "true").lower() == "true"),
            scatter_branches="branches" in scatter,
        )

    _s_gatherNodes = _s_nodes

    def _s_scoreNodes(self, node: ExprNode) -> DataFrame:
        """scoreNodes(collection, <nodes stream>) —
        ScoreNodesStream.java tf-idf node ranking; the collection names
        the edge relation the docFreq/numDocs statistics come from."""
        from .graph import score_nodes

        edges = self.tables.get(node.args[0])
        if edges is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        nodes = self._stream(node.args[1])
        return score_nodes(
            edges=edges, nodes=nodes,
            dst=node.kwargs.get("gather", "dst"),
            term_freq_col=node.kwargs.get("termFreq", "n_in"))

    def _s_shortestPath(self, node: ExprNode) -> DataFrame:
        """shortestPath(collection, from="a", to="b", edge="src=dst",
        maxDepth=N) — ShortestPathStream.java; emits every shortest
        path as a `path` array tuple."""
        from .graph import shortest_paths

        edges = self.tables.get(node.args[0])
        if edges is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        src, dst = (c.strip() for c in node.kwargs["edge"].split("="))
        return shortest_paths(
            edges,
            node.kwargs["from"],
            node.kwargs["to"],
            src=src,
            dst=dst,
            max_depth=int(node.kwargs.get("maxDepth", 4)),
        )

    # -- set / enrichment streams ----------------------------------------
    @staticmethod
    def _on_pairs(spec: str) -> list[tuple[str, str]]:
        """``on="a,x=y"`` → [(a, a), (x, y)] (left field, right field) —
        the fieldName=fieldName aliasing of Join/Complement/Intersect
        streams (io/eq/FieldEqualitor.java)."""
        out = []
        for part in spec.split(","):
            l, _, r = part.strip().partition("=")
            out.append((l.strip(), (r or l).strip()))
        return out

    def _semi(self, node: ExprNode, how: str) -> DataFrame:
        left = self._stream(node.args[0])
        right = self._stream(node.args[1])
        pairs = self._on_pairs(node.kwargs["on"])
        cond = None
        for l, r in pairs:
            c = left[l] == right[r]
            cond = c if cond is None else (cond & c)
        return left.join(right, cond, how)

    def _s_complement(self, node: ExprNode) -> DataFrame:
        """complement(A, B, on=...) — ComplementStream.java: tuples of A
        with NO matching tuple in B (anti join on the equalitor)."""
        return self._semi(node, "left_anti")

    def _s_intersect(self, node: ExprNode) -> DataFrame:
        """intersect(A, B, on=...) — IntersectStream.java: tuples of A
        WITH a matching tuple in B (semi join; B's fields not emitted)."""
        return self._semi(node, "left_semi")

    def _s_outerHashJoin(self, node: ExprNode) -> DataFrame:
        # OuterHashJoinStream: left outer, hashed side fully in memory
        return self._join(node, "left", broadcast=True)

    def _s_cartesianProduct(self, node: ExprNode) -> DataFrame:
        """cartesianProduct(stream, fieldA) — CartesianProductStream.java:
        one output tuple per element of the multivalued field, the
        array replaced by the element (F.explode — the row-local
        unnest, no shuffle)."""
        df = self._stream(node.args[0])
        fld = str(node.args[1]).strip()
        out = df.withColumn(fld, F.explode(F.col(fld)))
        if "productSort" in node.kwargs:
            out = out.orderBy(*self._sort_cols(node.kwargs["productSort"]))
        return out

    def _s_fetch(self, node: ExprNode) -> DataFrame:
        """fetch(collection, stream, fl="a,b", on="id=key") —
        FetchStream.java: enrich each tuple with fields fetched from
        the collection by key. The reference batches point lookups
        (batchSize); the relational rendering is one left join against
        the collection projected to (key, fl) — the batching is the
        join itself."""
        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        df = self._stream(node.args[1])
        (l, r), = self._on_pairs(node.kwargs["on"])
        fl = [c.strip() for c in node.kwargs["fl"].split(",")]
        proj = coll.select(F.col(r).alias(l), *[c for c in fl if c != r])
        return df.join(F.broadcast(proj.dropDuplicates([l])), l, "left")

    def _s_sql(self, node: ExprNode) -> DataFrame:
        """sql(stmt="SELECT ...") — Solr's Parallel SQL handler
        (SqlStream.java / solr/core/.../handler/sql/*: Calcite plans a
        SQL statement onto streaming expressions). Here the platform
        IS a SQL engine: collections register as temp views and
        Catalyst does what Calcite+streams do in the reference."""
        stmt = node.kwargs.get("stmt") or node.args[0]
        spark = next(iter(self.tables.values())).sparkSession
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)
        return spark.sql(str(stmt))

    def _s_echo(self, node: ExprNode) -> DataFrame:
        """echo("text") — EchoStream.java: one tuple with the text."""
        spark = next(iter(self.tables.values())).sparkSession
        return spark.createDataFrame(
            [(str(node.args[0]),)], "echo string")

    def _s_let(self, node: ExprNode) -> DataFrame:
        """let(a=<stream>, b=col(a, f), c=<math over b>, <final>) —
        LetStream.java + the math-expression variable context: stream
        bindings stay lazy DataFrames; non-stream bindings evaluate
        EAGERLY in the driver-side numpy math context
        (streaming/mathexpr.py — Solr evaluates its math expressions
        the same single-node way over materialized tuples). The
        positional arg (or last binding) is the result; a math result
        (tuple(...), vector, number) renders as a one-row DataFrame."""
        from .mathexpr import MathContext, eval_math

        scoped = dict(self.tables)
        sub = StreamFactory(scoped)
        ctx = MathContext(seed_text=repr(node))
        ctx.env = scoped  # one namespace: streams AND math variables
        last = None
        for k, v in node.kwargs.items():
            if isinstance(v, ExprNode) and v.name != "tuple" \
                    and hasattr(self, f"_s_{v.name}"):
                val = sub._stream(v)
            elif isinstance(v, ExprNode):
                # tuple() binds as a MATH value (dict) so getValue/
                # setValue compose on it, matching its final-position
                # treatment
                val = eval_math(v, ctx)
            else:
                val = scoped.get(v, v)
            scoped[k] = last = val
        exprs = [a for a in node.args if isinstance(a, ExprNode)]
        if exprs:
            fin = exprs[-1]
            if hasattr(self, f"_s_{fin.name}") and fin.name != "tuple":
                return sub._stream(fin)
            return self._math_df(eval_math(fin, ctx))
        if last is None:
            raise ValueError("let() needs at least one binding")
        if isinstance(last, DataFrame):
            return last
        return self._math_df(last)

    def _math_df(self, val) -> DataFrame:
        """Render a math-context value as a one-row DataFrame (the
        tuple a GetValue/zplot-style terminal emits)."""
        from pyspark.sql import SparkSession

        from .mathexpr import _tolist

        spark = (next(iter(self.tables.values())).sparkSession
                 if self.tables else SparkSession.getActiveSession())
        v = _tolist(val)
        if not isinstance(v, dict):
            v = {"return-value": v}
        row = {}
        for k, x in v.items():
            if isinstance(x, dict):
                import json

                row[k] = json.dumps(x, sort_keys=True)
            else:
                row[k] = x
        return spark.createDataFrame([tuple(row.values())],
                                     list(row.keys()))

    def _s_tuple(self, node: ExprNode) -> DataFrame:
        """tuple(k=<math expr>, ...) — TupStream.java: one tuple of
        evaluated expressions."""
        from .mathexpr import MathContext, eval_math

        return self._math_df(eval_math(
            node, MathContext(dict(self.tables), repr(node))))

    def _s_list(self, node: ExprNode) -> DataFrame:
        """list(sA, sB, ...) — ListStream.java: emit each wrapped
        stream's tuples in order."""
        dfs = [self._stream(a) for a in node.args
               if isinstance(a, ExprNode)]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def _s_cell(self, node: ExprNode) -> DataFrame:
        """cell(name, stream) — CellStream.java: materialize the
        stream as a named list-of-tuples variable (here: the stream
        itself, bound under the name by the enclosing let)."""
        return self._stream(node.args[1])

    def _s_model(self, node: ExprNode) -> DataFrame:
        """model(collection, id="name") — ModelStream.java: fetch the
        latest stored iteration of a named model from a models
        collection (train() output persisted via update()); ties
        break on the highest iteration."""
        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        mid = node.kwargs.get("id") or node.kwargs.get("name")
        if mid is not None and "name_s" in coll.columns:
            coll = coll.where(F.col("name_s") == mid)
        elif mid is not None and "id" in coll.columns:
            coll = coll.where(F.col("id") == mid)
        it_col = ("iteration_i" if "iteration_i" in coll.columns
                  else "iteration")
        return coll.orderBy(F.desc(it_col)).limit(1)

    def _s_eval(self, node: ExprNode) -> DataFrame:
        """eval(stream) — EvalStream.java: read the FIRST tuple of the
        wrapped stream, take its ``expr_s`` field as a streaming
        expression, compile and run it. The meta-programming hook the
        daemon/admin tooling uses."""
        first = self._stream(node.args[0]).first()
        if first is None or "expr_s" not in first.asDict():
            raise ValueError("eval() needs a stream whose first tuple "
                             "has an expr_s field")
        return self.compile(first["expr_s"])

    def _s_significantTerms(self, node: ExprNode) -> DataFrame:
        """significantTerms(collection, q=..., field=..., limit=20,
        minDocFreq=5, maxDocFreq=.3) —
        SignificantTermsQParserPlugin.java:206 scoring over a text
        column: score = log(fg_tf) * (log((numDocs+1)/(docFreq+1))
        + 1.0), with the min/max background-df gates interpreted as
        fractions when < 1 (:167-178). Tokenization is the stream's
        lowercase word split; the indexed-field rendering is the
        relational ft_significant_terms row."""
        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        field = node.kwargs.get("field", "text")
        limit = int(node.kwargs.get("limit", 20))
        min_df = float(node.kwargs.get("minDocFreq", 5))
        max_df = float(node.kwargs.get("maxDocFreq", 0.3))
        num_docs = coll.count()

        def doc_terms(df):
            return df.select(F.explode(F.array_distinct(F.filter(
                F.split(F.lower(F.col(field)), "[^a-z0-9]+"),
                lambda t: t != ""))).alias("term"))

        fg_src = (self._apply_q(coll, node.kwargs["q"])
                  if "q" in node.kwargs else coll)
        bg = doc_terms(coll).groupBy("term").agg(
            F.count("*").alias("docFreq"))
        fg = doc_terms(fg_src).groupBy("term").agg(
            F.count("*").alias("foreground"))
        # values strictly below 1.0 read as fractions of numDocs, else
        # absolute counts — ONE rule for both gates
        lo = min_df * num_docs if min_df < 1.0 else min_df
        hi = max_df * num_docs if max_df < 1.0 else max_df
        score = (F.log(F.col("foreground").cast("double"))
                 * (F.log((F.lit(float(num_docs + 1)))
                          / (F.col("docFreq") + 1.0)) + 1.0))
        return (fg.join(bg, "term")
                .where((F.col("docFreq") >= lo) & (F.col("docFreq") <= hi))
                .select("term", "foreground", "docFreq",
                        F.round(score, 5).alias("score"))
                .orderBy(F.desc("score"), F.asc("term")).limit(limit))

    def _s_train(self, node: ExprNode) -> DataFrame:
        """train(collection, q=..., field=..., outcome=...,
        positiveLabel=1, maxIterations=N) — TextLogitStream.java: one
        tuple per iteration with weights + error (the deterministic
        full-batch rendering documented in streaming/mlstreams.py).
        Features default to the top-|terms| IGain selection like
        features()/train composition."""
        from .mlstreams import features_selection, text_logit

        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        field = node.kwargs.get("field", "text")
        outcome = node.kwargs.get("outcome", "outcome")
        positive = node.kwargs.get("positiveLabel", "1")
        iters = int(node.kwargs.get("maxIterations", 10))
        n_feats = int(node.kwargs.get("numTerms", 4))
        base = coll.select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col(field).alias("_text"),
            (F.col(outcome).cast("string") == str(positive))
            .cast("int").alias("outcome"))
        toks = base.select(
            "doc_id",
            F.explode(F.filter(
                F.split(F.lower(F.col("_text")), "[^a-z0-9]+"),
                lambda t: t != "")).alias("term"))
        labels = base.select("doc_id", "outcome")
        feats = features_selection(toks, labels, n_feats).collect()
        terms = tuple(r["term"] for r in feats)
        recs = text_logit(toks, labels, terms, iterations=iters)
        spark = coll.sparkSession
        rows = [tuple([r["iteration"]] + [float(w) for w in r["weights"]]
                      + [float(r["error"])]) for r in recs]
        schema = ("iteration int, "
                  + ", ".join(f"w{i} double" for i in range(len(terms) + 1))
                  + ", error double")
        return spark.createDataFrame(rows, schema).orderBy("iteration")

    def _s_plot(self, node: ExprNode) -> DataFrame:
        """plot(x=<vector>, y=<vector>, type=scatter) —
        PlotStream.java: one tuple carrying the plot data + type (the
        UI renders it; the stream just emits the tuple)."""
        from .mathexpr import MathContext, eval_math, _tolist

        ctx = MathContext(dict(self.tables), repr(node))
        row = {}
        for k, v in node.kwargs.items():
            if k == "type":
                continue
            row[k] = _tolist(eval_math(v, ctx))
        row["plot"] = str(node.kwargs.get("type", "scatter"))
        return self._math_df(row)

    def _s_knnSearch(self, node: ExprNode) -> DataFrame:
        """knnSearch(collection, field=<vector col>, vector="v1,v2..",
        k=10) — the {!knn} dense-vector top-k (KnnQParser role):
        brute-force cosine over the collection's vector column, exact
        top-k (the same baseline the ANN suite rows verify against)."""
        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        field = node.kwargs["field"]
        qv = [float(x) for x in
              str(node.kwargs["vector"]).replace("[", "")
              .replace("]", "").split(",")]
        k = int(node.kwargs.get("k", 10))
        q = F.array(*[F.lit(x) for x in qv])
        dot = F.aggregate(
            F.zip_with(F.col(field), q, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        nrm = F.sqrt(F.aggregate(
            F.transform(F.col(field), lambda a: a * a),
            F.lit(0.0), lambda acc, x: acc + x))
        qn = math.sqrt(sum(x * x for x in qv))
        if qn == 0.0:
            raise ValueError("knnSearch query vector has zero norm")
        # zero-magnitude document vectors: cosine undefined (0/0=NaN,
        # which Spark sorts ABOVE all doubles descending) — rank last
        score = F.when(nrm > 0.0, dot / (nrm * F.lit(qn))) \
            .otherwise(F.lit(float("-inf")))
        return (coll.withColumn("score", score)
                .orderBy(F.desc("score")).limit(k))

    def _s_reduce(self, node: ExprNode) -> DataFrame:
        """reduce(stream, by="f", group(sort="x desc", n=5)) —
        ReducerStream.java + GroupOperation: the top-n tuples of each
        group in the wrapped stream. One window per group key; dup
        groups are bounded so the window never sees skew."""
        from pyspark.sql.window import Window

        inner = self._stream(node.args[0])
        by = [c.strip() for c in node.kwargs["by"].split(",")]
        gops = [a for a in node.args[1:]
                if isinstance(a, ExprNode) and a.name == "group"]
        if not gops:
            raise ValueError("reduce() needs a group(...) operation")
        sort_spec = gops[0].kwargs.get("sort")
        n = int(gops[0].kwargs.get("n", 1))
        w = Window.partitionBy(*by).orderBy(*self._sort_cols(sort_spec))
        return (inner.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") <= n).drop("_rn"))

    def _s_distinct(self, node: ExprNode) -> DataFrame:
        """distinct(stream, over="f") — alias of unique
        (UniqueStream.java registers both)."""
        return self._s_unique(node)

    def _s_shuffle(self, node: ExprNode) -> DataFrame:
        """shuffle(collection, ...) — ShuffleStream.java: a search
        relayed through /export for parallel partitioning; the Spark
        plan is the same pushed-down scan."""
        return self._s_search(node)

    def _s_random(self, node: ExprNode) -> DataFrame:
        """random(collection, q=..., rows=n, fl=...) —
        RandomStream.java: pseudo-random docs. Deterministically
        SEEDED here (stable hash of the expression) so reruns
        reproduce the sample — the seeded-determinism contract of the
        math context's samplers."""
        from .mathexpr import _stable_seed

        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        if "q" in node.kwargs:
            coll = self._apply_q(coll, node.kwargs["q"])
        if "fl" in node.kwargs:
            coll = coll.select(*[c.strip() for c in
                                 node.kwargs["fl"].split(",")])
        seed = _stable_seed(repr(node)) % (2 ** 31)
        coll = coll.orderBy(F.rand(seed))
        if "rows" in node.kwargs:
            coll = coll.limit(int(node.kwargs["rows"]))
        return coll

    def _s_get(self, node: ExprNode) -> DataFrame:
        """get(name) — GetStream.java: read a let-bound variable."""
        df = self.tables.get(node.args[0])
        if df is None:
            raise ValueError(f"unbound let variable {node.args[0]}")
        return df

    def _s_timeseries(self, node: ExprNode) -> DataFrame:
        """timeseries(collection, q=..., field="ts",
        start="2020-01-01T00:00:00Z", end="NOW", gap="+1DAY",
        <metrics>) — TimeSeriesStream.java:419: date-math start/end/
        gap (calendar-aware: +1MONTH buckets are unequal widths),
        one row per bucket with the metrics.

        Plan: the (tiny) bucket-edge table is computed driver-side
        with the repo's DateMathParser and broadcast; rows range-join
        to their bucket, then ONE exchange for the grouped metrics.
        The [start, end) filter is a plain timestamp predicate —
        partition/row-group prunable at the scan."""
        from datetime import datetime

        from ..functions.datemath import parse_date_math

        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        if "q" in node.kwargs:
            coll = self._apply_q(coll, node.kwargs["q"])
        fld = node.kwargs["field"]
        now = datetime.utcnow()
        start = parse_date_math(node.kwargs["start"], now=now)
        end = parse_date_math(node.kwargs["end"], now=now)
        gap = node.kwargs["gap"]
        edges = [start]
        while edges[-1] < end:
            nxt = parse_date_math(edges[-1].isoformat() + gap)
            if nxt <= edges[-1]:
                raise ValueError(f"non-advancing gap {gap!r}")
            edges.append(nxt)
        spark = coll.sparkSession
        buckets = spark.createDataFrame(
            [(lo.isoformat(sep=" "), lo, hi)
             for lo, hi in zip(edges, edges[1:])],
            f"{fld}_bucket string, _lo timestamp, _hi timestamp")
        c = F.col(fld)
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, ExprNode)]
        return (coll.where((c >= F.lit(start)) & (c < F.lit(edges[-1])))
                .join(F.broadcast(buckets), (c >= F.col("_lo")) & (c < F.col("_hi")))
                .groupBy(f"{fld}_bucket").agg(*metrics)
                .orderBy(f"{fld}_bucket"))

    _s_timeSeries = _s_timeseries

    def _s_stats(self, node: ExprNode) -> DataFrame:
        """stats(collection, q=..., <metrics>) — StatsStream.java: one
        aggregate tuple over the matching docs."""
        coll = self.tables.get(node.args[0])
        if coll is None:
            raise ValueError(f"unknown collection {node.args[0]}")
        if "q" in node.kwargs:
            coll = self._apply_q(coll, node.kwargs["q"])
        metrics = [_metric(a) for a in node.args[1:] if isinstance(a, ExprNode)]
        return coll.agg(*metrics)


def _autocast(v: str):
    if _NUM.match(v):
        return float(v) if "." in v else int(v)
    return v
