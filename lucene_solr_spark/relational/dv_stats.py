"""DocValuesStats: per-field statistics over the docs matching a query.

Reference: ``lucene/misc/src/java/org/apache/lucene/search/
DocValuesStats.java`` + ``DocValuesStatsCollector.java`` — a collector
that, for every matching doc, accumulates per-field count / missing /
min / max, numeric mean + POPULATION variance (Welford accumulation,
``variance / count`` at :131-134) + stdev + sum
(Long/DoubleDocValuesStats :145-203), lexicographic min/max for sorted
(string) fields (SortedDocValuesStats), and for sorted-numeric (array)
fields a per-VALUE mean/variance with ``valuesCount`` distinct from the
doc ``count`` (SortedNumericDocValuesStats :205-250).

Spark mapping: the collector IS one conditional aggregation — every
per-field accumulator becomes an agg expression over the filtered scan,
partial-aggregated map-side (the per-leaf accumulate/merge the
reference does by hand). ``missing`` = matching docs without a value =
``count(*) - count(col)``. Population variance = ``var_pop`` (identical
to the reference's Welford result in exact arithmetic). Array fields
avoid ``explode`` — value counts/sums/extrema fold inside the row via
``aggregate``/``array_min``/``array_max``, so a doc with a
1000-value field never fans out 1000 rows into the agg exchange.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .suite import load_table, register

_NUM_COLS = ("cnt", "missing", "vmin", "vmax", "vsum", "mean",
             "variance", "stdev", "values_count", "str_min", "str_max")


def _tagged(field: str, **cols: Column) -> list[Column]:
    """One tagged-union output row: field label + the stat columns,
    nulling whichever stats the field kind doesn't define."""
    out = [F.lit(field).alias("field")]
    for c in _NUM_COLS:
        col = cols.get(c)
        if col is None:
            col = F.lit(None).cast(
                "string" if c.startswith("str_") else "double")
        out.append(col.alias(c))
    return out


def docvalues_stats(
    df: DataFrame,
    numeric_fields: tuple[str, ...] = (),
    sorted_fields: tuple[str, ...] = (),
    sorted_numeric_fields: tuple[str, ...] = (),
    predicate: Column | None = None,
) -> DataFrame:
    """DocValuesStatsCollector over ``predicate``-matching docs: one
    row per field with the stats its DocValues kind defines."""
    if predicate is not None:
        df = df.where(predicate)
    aggs: list[Column] = [F.count("*").alias("__total")]
    for f in numeric_fields:
        c = F.col(f).cast("double")
        aggs += [
            F.count(c).alias(f"{f}__cnt"),
            F.min(c).alias(f"{f}__min"),
            F.max(c).alias(f"{f}__max"),
            F.sum(c).alias(f"{f}__sum"),
            F.avg(c).alias(f"{f}__mean"),
            F.var_pop(c).alias(f"{f}__var"),
            F.stddev_pop(c).alias(f"{f}__sd"),
        ]
    for f in sorted_fields:
        c = F.col(f)
        aggs += [
            F.count(c).alias(f"{f}__cnt"),
            F.min(c).alias(f"{f}__smin"),
            F.max(c).alias(f"{f}__smax"),
        ]
    for f in sorted_numeric_fields:
        arr = F.col(f)
        present = F.when(arr.isNotNull() & (F.size(arr) > 0), arr)
        vals = F.coalesce(F.size(arr), F.lit(0)).cast("long")
        vsum = F.aggregate(
            F.coalesce(arr, F.array()), F.lit(0.0),
            lambda a, x: a + x.cast("double"))
        vsq = F.aggregate(
            F.coalesce(arr, F.array()), F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"))
        aggs += [
            F.count(present).alias(f"{f}__cnt"),
            F.min(F.array_min(present)).alias(f"{f}__min"),
            F.max(F.array_max(present)).alias(f"{f}__max"),
            F.sum(vals).alias(f"{f}__vc"),
            F.sum(vsum).alias(f"{f}__sum"),
            F.sum(vsq).alias(f"{f}__sumsq"),
        ]
    wide = df.agg(*aggs)
    pieces = []
    for f in numeric_fields:
        pieces.append(wide.select(*_tagged(
            f,
            cnt=F.col(f"{f}__cnt").cast("double"),
            missing=(F.col("__total") - F.col(f"{f}__cnt"))
            .cast("double"),
            vmin=F.col(f"{f}__min"), vmax=F.col(f"{f}__max"),
            vsum=F.col(f"{f}__sum"), mean=F.col(f"{f}__mean"),
            variance=F.col(f"{f}__var"), stdev=F.col(f"{f}__sd"),
        )))
    for f in sorted_fields:
        pieces.append(wide.select(*_tagged(
            f,
            cnt=F.col(f"{f}__cnt").cast("double"),
            missing=(F.col("__total") - F.col(f"{f}__cnt"))
            .cast("double"),
            str_min=F.col(f"{f}__smin"), str_max=F.col(f"{f}__smax"),
        )))
    for f in sorted_numeric_fields:
        # per-VALUE mean and population variance
        # (SortedNumericDocValuesStats): E[x²] − mean² over valuesCount
        vc = F.col(f"{f}__vc")
        mean = F.when(vc > 0, F.col(f"{f}__sum") / vc)
        var = F.when(vc > 0,
                     F.col(f"{f}__sumsq") / vc - mean * mean)
        pieces.append(wide.select(*_tagged(
            f,
            cnt=F.col(f"{f}__cnt").cast("double"),
            missing=(F.col("__total") - F.col(f"{f}__cnt"))
            .cast("double"),
            vmin=F.col(f"{f}__min"), vmax=F.col(f"{f}__max"),
            vsum=F.col(f"{f}__sum"), mean=mean, variance=var,
            stdev=F.sqrt(var),
            values_count=vc.cast("double"),
        )))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("field")


# ---------------------------------------------------------------------------
# Driver row: stats over lineitem rows matching l_quantity >= 25 (the
# "query" the collector is installed behind), two numeric fields + one
# sorted field. Roundings per the suite's float-gate convention.
# ---------------------------------------------------------------------------

_DVS_ORACLE = """
WITH m AS (SELECT * FROM lineitem WHERE l_quantity >= 25),
t AS (SELECT count(*) AS total FROM m)
SELECT 'l_discount' AS field,
       CAST(count(l_discount) AS DOUBLE) AS cnt,
       CAST(total - count(l_discount) AS DOUBLE) AS missing,
       round(min(l_discount), 4) AS vmin, round(max(l_discount), 4) AS vmax,
       round(sum(l_discount), 2) AS vsum, round(avg(l_discount), 4) AS mean,
       round(var_pop(l_discount), 4) AS variance,
       round(stddev_pop(l_discount), 4) AS stdev,
       CAST(NULL AS DOUBLE) AS values_count,
       CAST(NULL AS VARCHAR) AS str_min, CAST(NULL AS VARCHAR) AS str_max
FROM m, t GROUP BY total
UNION ALL
SELECT 'l_quantity',
       CAST(count(l_quantity) AS DOUBLE),
       CAST(total - count(l_quantity) AS DOUBLE),
       round(min(l_quantity), 4), round(max(l_quantity), 4),
       round(sum(l_quantity), 2), round(avg(l_quantity), 4),
       round(var_pop(l_quantity), 4), round(stddev_pop(l_quantity), 4),
       NULL, NULL, NULL
FROM m, t GROUP BY total
UNION ALL
SELECT 'l_returnflag',
       CAST(count(l_returnflag) AS DOUBLE),
       CAST(total - count(l_returnflag) AS DOUBLE),
       NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       min(l_returnflag), max(l_returnflag)
FROM m, t GROUP BY total
ORDER BY field
"""


@register("docvalues_stats", _DVS_ORACLE)
def docvalues_stats_entry(spark, sf_dir):
    """DocValuesStatsCollector over a filtered scan (misc/
    DocValuesStats.java): numeric mean/var_pop/stdev/sum/extrema +
    sorted-field lexicographic extrema, one conditional-agg pass."""
    li = load_table(spark, sf_dir, "lineitem")
    out = docvalues_stats(
        li,
        numeric_fields=("l_discount", "l_quantity"),
        sorted_fields=("l_returnflag",),
        predicate=F.col("l_quantity") >= 25,
    )
    return out.select(
        "field", "cnt", "missing",
        F.round("vmin", 4).alias("vmin"), F.round("vmax", 4).alias("vmax"),
        F.round("vsum", 2).alias("vsum"), F.round("mean", 4).alias("mean"),
        F.round("variance", 4).alias("variance"),
        F.round("stdev", 4).alias("stdev"),
        "values_count", "str_min", "str_max")
