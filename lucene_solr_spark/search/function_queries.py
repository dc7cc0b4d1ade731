"""Solr function queries over the index (ValueSourceParser registry).

Re-expresses the commonly used core of Solr's function-query surface
(solr/core/src/java/org/apache/solr/search/ValueSourceParser.java,
which registers ~101 parsers; lucene/queries/src/java/org/apache/
lucene/queries/function/valuesource/*.java) as a compiler from the
Solr function syntax — ``sum(termfreq(content,'spark'), log(docfreq(
content,'spark')))`` — to a per-document Spark plan.

Index-aware sources:
  termfreq(f,t)   TermFreqValueSource      postings tf left-join
  docfreq(f,t)    DocFreqValueSource       dict scalar (literal)
  idf(f,t)        IDFValueSource           scorer idf (float32 literal)
  norm(f)         NormValueSource          per-doc norm byte
  dl(f)           (norms decode role)      per-doc Lucene length (dl)
  numdocs()       NumDocsValueSource       doc_count literal
  field(x) / x    FieldCacheSource         docs-table column

Index-aware (continued): totaltermfreq/ttf, sumtotaltermfreq/sttf,
maxdoc — TotalTermFreqValueSource, SumTotalTermFreqValueSource,
MaxDocValueSource.

Pure functions: sum sub product div min max abs log ln sqrt pow mod
if exists linear recip map strdist(edit) scale — the io/eval twins;
ValueSourceParser registers the same names. ``scale(x,min,max)`` is
two-pass like ScaleFloatFunction (corpus min/max broadcast-joined).

Round-3 widening toward the full 101-parser registry
(ValueSourceParser.java static block):

* math zoo — exp e pi rad deg cos sin tan acos asin atan sinh cosh
  tanh atan2 hypot cbrt ceil floor rint (DoubleFunction/
  DualDoubleFunction parsers);
* boolean/comparison — not and or xor eq lt lte gt gte
  (BoolFunction + ComparisonBoolFunction parsers), ``def(x,d)``
  (DefFunction: first existing value);
* vectors — ``dist(p,...)`` / ``sqedist(...)`` (VectorDistanceFunction
  / SquaredEuclideanFunction: first arg is the p-norm power, the rest
  splits into two equal-length points), ``geodist(latF,lonF,lat,lon)``
  (HaversineConstFunction, km over WGS84 mean radius);
* dates — ``ms(a[,b])`` (DateValueSourceParser: epoch millis of one
  date, or a−b in millis for two);
* index-aware — ``tf(f,t)`` (TFValueSource: the *similarity's* tf, =
  sqrt(freq) for TFIDF/ClassicSimilarity, vs termfreq's raw count),
  ``ord(f)`` / ``rord(f)`` (OrdFieldSource/ReverseOrdFieldSource:
  1-based ordinal of the doc's value in the field's sorted value
  space — computed as a rank over the DISTINCT value set joined back,
  so the global sort touches |values| rows, not |docs|);
* nested queries — ``query(\"...\")`` (QueryValueSource: the
  subquery's score, 0 when it doesn't match; the string is parsed by
  the classic QueryParser) and ``boost(q, f)`` (BoostedQuery role:
  query score × function).

A FunctionQuery matches ALL documents, scoring each by the function
(queries/function/FunctionQuery.java:71-116 AllScorer) — rendered as
the docs table left-joined with each termfreq leaf's postings
projection, evaluated as one Catalyst projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..streaming.expressions import ExprNode, _NUM, parse_expression


class FunctionQueryCompiler:
    """Compiles one function-query string against an IndexSearcher."""

    def __init__(self, searcher, dv_root: str | None = None):
        self.searcher = searcher
        #: optional docvalues root (index/docvalues.py): field(x) then
        #: resolves x through the merge-on-read DV overlay when the
        #: field has a dv/ column there — Solr's in-place-updatable
        #: docValues feeding function queries without reindex
        self.dv_root = dv_root

    def dataframe(self, expr: str, alias: str = "score") -> DataFrame:
        """DataFrame(docid, <alias>) over ALL live docs (FunctionQuery
        AllScorer semantics)."""
        node = (parse_expression(expr) if "(" in expr else expr)
        self._tf_cols: dict[tuple[str, str], str] = {}
        self._scales: list[tuple[str, object, float, float]] = []
        self._query_cols: dict[str, str] = {}
        self._ord_cols: dict[tuple[str, bool], str] = {}
        self._dv_cols: dict[str, str] = {}
        col = self._compile(node)
        df = self.searcher.docs.select("docid", "dl", "norm", *[
            c for c in self.searcher.docs.columns
            if c not in ("docid", "dl", "norm")])
        for (field, term), name in self._tf_cols.items():
            sub = (self.searcher._postings_for([term], field=field)
                   .select("docid", F.col("tf").alias(name)))
            df = df.join(sub, "docid", "left")
        for fld, name in self._dv_cols.items():
            from ..index.docvalues import read_docvalues

            dv = read_docvalues(df.sparkSession, self.dv_root, fld).select(
                "docid", F.col("value").alias(name))
            df = df.join(dv, "docid", "left")
        # query(...) leaves: the subquery's scored set left-joined;
        # non-matching docs score 0 (QueryValueSource.objectVal)
        for qs, name in self._query_cols.items():
            from .parser import QueryParser

            sub = (self.searcher.search_df(QueryParser().parse(qs), k=None)
                   .select("docid", F.col("score").alias(name)))
            df = df.join(sub, "docid", "left")
        # ord/rord: rank over the field's DISTINCT values (small side),
        # joined back — OrdFieldSource's sorted-ordinal semantics
        # without a global sort of the docs table
        for (fld, rev), name in self._ord_cols.items():
            from pyspark.sql import Window

            order = F.col(fld).desc() if rev else F.col(fld).asc()
            vals = (df.select(fld).where(F.col(fld).isNotNull()).distinct()
                    .withColumn(name, F.dense_rank().over(
                        Window.orderBy(order))))
            df = df.join(F.broadcast(vals), fld, "left")
        if self.searcher.deletes is not None:
            df = df.join(F.broadcast(self.searcher.deletes),
                         "docid", "left_anti")
        # scale(x,min,max) is two-pass (ScaleFloatFunction.createWeight
        # computes the corpus min/max up front): materialize each inner
        # column, broadcast-join its global extremes, rescale
        for name, inner, lo, hi in self._scales:
            df = df.withColumn(f"_{name}_in", inner)
            agg = df.agg(F.min(f"_{name}_in").alias(f"_{name}_mn"),
                         F.max(f"_{name}_in").alias(f"_{name}_mx"))
            df = df.crossJoin(F.broadcast(agg))
            span = F.col(f"_{name}_mx") - F.col(f"_{name}_mn")
            scaled = F.when(span == 0, F.lit(lo)).otherwise(
                F.lit(lo) + (F.col(f"_{name}_in") - F.col(f"_{name}_mn"))
                * F.lit(hi - lo) / span)
            df = df.withColumn(name, scaled)
        return df.select("docid", col.alias(alias))

    # -- compilation ----------------------------------------------------
    def _compile(self, node):
        if isinstance(node, str):
            t = node.strip("'\"")
            if _NUM.match(t):
                return F.lit(float(t) if "." in t else int(t))
            return F.col(t)  # field(x) shorthand / docs-table column
        assert isinstance(node, ExprNode)
        name, args = node.name, node.args
        if name == "termfreq":
            f, t = self._ft(args)
            cname = self._tf_cols.setdefault(
                (f, t), f"_tf_{len(self._tf_cols)}")
            return F.coalesce(F.col(cname), F.lit(0))
        if name == "docfreq":
            f, t = self._ft(args)
            return F.lit(self.searcher.term_stats({(f, t)}).get((f, t), 0))
        if name == "idf":
            f, t = self._ft(args)
            df_ = self.searcher.term_stats({(f, t)}).get((f, t), 0)
            scorer = self.searcher.field_scorer(f)
            return F.lit(float(scorer.idf(df_)) if df_ else 0.0)
        if name == "norm":
            return F.col("norm")
        if name == "dl":
            return F.col("dl")
        if name == "numdocs":
            return F.lit(self.searcher.doc_count)
        if name == "maxdoc":
            return F.lit(self.searcher.doc_count)  # no deletions gap here
        if name in ("totaltermfreq", "ttf"):
            f, t = self._ft(args)
            return F.lit(self.searcher._ttf_for({(f, t)}).get((f, t), 0))
        if name in ("sumtotaltermfreq", "sttf"):
            f = str(args[0]).strip("'\"") if args else "content"
            st = self.searcher.field_stats.get(f, {})
            return F.lit(int(st.get("sum_ttf", 0)))
        if name == "scale":
            # two-pass (min/max over the corpus) — registered here,
            # materialized by dataframe()
            inner = self._compile(args[0])
            lo = float(str(args[1]).strip("'\""))
            hi = float(str(args[2]).strip("'\""))
            cname = f"_scale_{len(self._scales)}"
            self._scales.append((cname, inner, lo, hi))
            return F.col(cname)
        if name == "field":
            fld = str(args[0]).strip("'\"")
            if self.dv_root is not None:
                import os as _os

                if _os.path.exists(_os.path.join(self.dv_root, "dv", fld)):
                    cname = self._dv_cols.setdefault(
                        fld, f"_dv_{len(self._dv_cols)}")
                    # missing DV value reads as 0 (Solr numeric default)
                    return F.coalesce(F.col(cname), F.lit(0))
            return F.col(fld)
        if name == "exists":
            return self._compile(args[0]).isNotNull()
        if name == "if":
            c, a, b = [self._compile(x) for x in args]
            return F.when(c.cast("boolean"), a).otherwise(b)
        cols = [self._compile(a) for a in args]
        if name == "sum":
            return _fold(cols, lambda x, y: x + y)
        if name == "sub":
            return cols[0] - cols[1]
        if name in ("product", "mul"):
            return _fold(cols, lambda x, y: x * y)
        if name == "div":
            return cols[0] / cols[1]
        if name == "min":
            return F.least(*cols)
        if name == "max":
            return F.greatest(*cols)
        if name == "abs":
            return F.abs(cols[0])
        if name == "log":
            return F.log10(cols[0])  # Solr log() is base-10
        if name == "ln":
            return F.log(cols[0])
        if name == "sqrt":
            return F.sqrt(cols[0])
        if name == "pow":
            return F.pow(cols[0], cols[1])
        if name == "mod":
            return cols[0] % cols[1]
        if name == "linear":
            # LinearFloatFunction: m*x + c
            return cols[1] * cols[0] + cols[2]
        if name == "recip":
            # RecipFloatFunction: a / (m*x + b) — the date-boost shape
            x, m, a, b = cols
            return a / (m * x + b)
        if name == "map":
            # MapFloatFunction: x in [min,max] → target, else x (or
            # default when given)
            x, lo, hi, target = cols[:4]
            dflt = cols[4] if len(cols) > 4 else x
            return F.when((x >= lo) & (x <= hi), target).otherwise(dflt)
        if name in _MATH1:
            return _MATH1[name](cols[0])
        if name in ("e", "pi"):
            import math

            return F.lit(math.e if name == "e" else math.pi)
        if name == "atan2":
            return F.atan2(cols[0], cols[1])
        if name == "hypot":
            return F.hypot(cols[0], cols[1])
        if name == "not":
            return ~cols[0].cast("boolean")
        if name == "and":
            return _fold([c.cast("boolean") for c in cols],
                         lambda x, y: x & y)
        if name == "or":
            return _fold([c.cast("boolean") for c in cols],
                         lambda x, y: x | y)
        if name == "xor":
            return _fold([c.cast("boolean") for c in cols],
                         lambda x, y: x ^ y)
        if name in ("eq", "lt", "lte", "gt", "gte"):
            a, b = cols
            return {"eq": a == b, "lt": a < b, "lte": a <= b,
                    "gt": a > b, "gte": a >= b}[name]
        if name == "def":
            # DefFunction: first source that exists for the doc
            return F.coalesce(*cols)
        if name == "sqedist":
            half = len(cols) // 2
            return _fold([(a - b) * (a - b) for a, b in
                          zip(cols[:half], cols[half:])],
                         lambda x, y: x + y)
        if name == "dist":
            # VectorDistanceFunction: dist(power, x1..xn, y1..yn)
            p = float(str(args[0]).strip("'\""))
            rest = cols[1:]
            half = len(rest) // 2
            deltas = [F.abs(a - b) for a, b in
                      zip(rest[:half], rest[half:])]
            if p == 0:  # sparseness: count of non-equal dims
                return _fold([(d != 0).cast("int") for d in deltas],
                             lambda x, y: x + y)
            if p == float("inf"):
                return F.greatest(*deltas) if len(deltas) > 1 else deltas[0]
            s = _fold([F.pow(d, F.lit(p)) for d in deltas],
                      lambda x, y: x + y)
            return F.pow(s, F.lit(1.0 / p))
        if name == "geodist":
            # HaversineConstFunction: great-circle km between the doc's
            # (latField, lonField) and a constant point
            latf, lonf, lat0, lon0 = cols
            dlat = F.radians(latf - lat0)
            dlon = F.radians(lonf - lon0)
            a = (F.sin(dlat / 2) ** 2
                 + F.cos(F.radians(latf)) * F.cos(F.radians(lat0))
                 * F.sin(dlon / 2) ** 2)
            return F.lit(2 * 6371.0087714) * F.asin(F.sqrt(a))
        if name == "ms":
            # DateValueSourceParser: epoch millis / millis between;
            # quoted ISO instants are literals, not column refs
            def _date_col(a, c):
                t = str(a).strip("'\"")
                if isinstance(a, str) and ("T" in t or "-" in t[1:]):
                    return F.lit(t).cast("timestamp")
                return c.cast("timestamp")

            dcols = [_date_col(a, c) for a, c in zip(args, cols)]
            if len(dcols) == 1:
                return (F.unix_micros(dcols[0]) / F.lit(1000)).cast("long")
            return ((F.unix_micros(dcols[0]) - F.unix_micros(dcols[1]))
                    / F.lit(1000)).cast("long")
        if name == "tf":
            # TFValueSource: the similarity's tf over the raw freq —
            # sqrt(freq) for TFIDFSimilarity (ClassicSimilarity.tf)
            f, t = self._ft(args)
            cname = self._tf_cols.setdefault(
                (f, t), f"_tf_{len(self._tf_cols)}")
            return F.sqrt(F.coalesce(F.col(cname), F.lit(0)).cast("double"))
        if name in ("ord", "rord"):
            fld = str(args[0]).strip("'\"")
            cname = self._ord_cols.setdefault(
                (fld, name == "rord"), f"_ord_{len(self._ord_cols)}")
            return F.coalesce(F.col(cname), F.lit(0))
        if name == "query":
            qs = str(args[0]).strip("'\"")
            cname = self._query_cols.setdefault(
                qs, f"_q_{len(self._query_cols)}")
            return F.coalesce(F.col(cname), F.lit(0.0))
        if name == "boost":
            qs = str(args[0]).strip("'\"")
            cname = self._query_cols.setdefault(
                qs, f"_q_{len(self._query_cols)}")
            return F.coalesce(F.col(cname), F.lit(0.0)) * self._compile(
                args[1])
        if name == "strdist":
            # StrDistValueSource, edit-distance measure (the "edit"
            # argument is accepted and is the only supported measure)
            a, b = self._compile(args[0]), self._compile(args[1])
            sim = (F.lit(1.0)
                   - F.levenshtein(a.cast("string"), b.cast("string"))
                   / F.greatest(F.length(a.cast("string")),
                                F.length(b.cast("string"))))
            return sim
        raise ValueError(f"unknown function-query source {name}")

    @staticmethod
    def _ft(args):
        if len(args) == 2:
            f, t = args
        else:
            f, t = "content", args[0]
        return str(f).strip("'\""), str(t).strip("'\"")


def _fold(cols, op):
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


#: single-argument math parsers (ValueSourceParser.java's
#: DoubleFunction block; names match Solr's registry)
_MATH1 = {
    "exp": F.exp, "rad": F.radians, "deg": F.degrees, "cos": F.cos,
    "sin": F.sin, "tan": F.tan, "acos": F.acos, "asin": F.asin,
    "atan": F.atan, "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
    "cbrt": F.cbrt, "ceil": F.ceil, "floor": F.floor, "rint": F.rint,
}
