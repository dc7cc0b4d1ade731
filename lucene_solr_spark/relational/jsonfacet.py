"""JSON Facet API compiler (solr/core/src/java/org/apache/solr/search/
facet/ — FacetRequest.java parse surface, FacetField/FacetRange/
FacetQuery processors, agg parsers in FacetParser.java).

Compiles a Solr ``json.facet`` request dict into ONE Spark DataFrame
plan over a document frame. Supported, matching the reference request
grammar:

  * ``{"type": "terms", "field": f, "limit": n, "mincount": m,
     "sort": "count desc" | "index asc" | "<agg> desc/asc",
     "facet": {...subfacets/aggs...}}``
  * ``{"type": "range", "field": f, "start": a, "end": b, "gap": g,
     "facet": {...aggs...}}``
  * ``{"type": "query", "q": "<sql boolean expr>",
     "facet": {...aggs...}}``
  * agg strings: ``"sum(col)" avg min max unique hll percentile(col,p)
    sumsq stddev variance missing countvals`` (FacetParser's agg set —
    the same set the `facet_aggs_extended` suite row hard-checks).

Output is the FLATTENED bucket table: one row per leaf bucket, with
``<name>_val`` / ``<name>_count`` columns per facet level and one
column per agg — the natural relational rendering of the reference's
nested bucket response (a JSON tree is a driver-side re-shape of this
frame, provided by :func:`to_buckets`).

Scale notes: every terms/range level is ONE groupBy over the frame
(map-side partial agg); per-bucket limits are rank windows over the
bucket grid, never a per-bucket re-scan; nested levels group by the
composite key in a single pass rather than issuing bucket-count
queries (the reference processes buckets one sub-request at a time —
the relational rendering is the 1000-executor shape of the same
answer).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_AGG_RE = re.compile(r"^(\w+)\((\w+)(?:\s*,\s*([0-9.]+))?\)$")


def _agg_column(spec: str, name: str):
    """One FacetParser agg string → a Spark aggregate Column."""
    m = _AGG_RE.match(spec.strip())
    if not m:
        raise ValueError(f"unsupported agg {spec!r}")
    fn, col, arg = m.group(1).lower(), m.group(2), m.group(3)
    if fn == "sum":
        return F.sum(col).alias(name)
    if fn == "avg":
        return F.avg(col).alias(name)
    if fn == "min":
        return F.min(col).alias(name)
    if fn == "max":
        return F.max(col).alias(name)
    if fn == "unique":
        return F.countDistinct(col).alias(name)
    if fn == "hll":
        return F.approx_count_distinct(col).alias(name)
    if fn == "sumsq":
        return F.sum(F.col(col) * F.col(col)).alias(name)
    if fn == "stddev":
        return F.stddev_samp(col).alias(name)
    if fn == "variance":
        return F.var_samp(col).alias(name)
    if fn == "missing":
        return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(name)
    if fn == "countvals":
        return F.count(col).alias(name)
    if fn == "percentile":
        p = float(arg if arg is not None else 50.0) / 100.0
        return F.expr(f"percentile({col}, {p})").alias(name)
    raise ValueError(f"unsupported agg function {fn!r}")


def _split(facet: dict) -> tuple[dict, dict]:
    """Partition a ``facet`` dict into (aggs, subfacets)."""
    aggs, subs = {}, {}
    for name, spec in (facet or {}).items():
        if isinstance(spec, str):
            aggs[name] = spec
        elif isinstance(spec, dict):
            subs[name] = spec
        else:
            raise ValueError(f"facet entry {name!r} must be str or dict")
    return aggs, subs


def _bucket_col(name: str, spec: dict):
    """The bucket expression for one facet level."""
    typ = spec.get("type", "terms")
    if typ == "terms":
        return F.col(spec["field"])
    if typ == "range":
        f, a, g = spec["field"], spec["start"], spec["gap"]
        # bucket lower bound, like FacetRange's [start + i*gap, +gap)
        return (F.floor((F.col(f) - F.lit(a)) / F.lit(g)) * F.lit(g)
                + F.lit(a))
    if typ == "query":
        return F.expr(spec["q"])
    raise ValueError(f"unsupported facet type {typ!r}")


def _apply_domain(df: DataFrame, spec: dict,
                  parents: list) -> DataFrame:
    """JSON-facet ``domain`` changes (FacetProcessor.java:138-289
    handleDomainChanges, in the reference's order: query reset →
    filter evaluation → join transfer → block join; for toChildren the
    filters act as acceptDocs INSIDE the transform :273-281, for
    toParent they apply after :282-284).

    Single-collection block model (Solr's): the frame carries parents
    AND children, children sharing the parent's key in ``_root_``
    (the Lucene _root_ field / index-block adjacency). Row-set
    transforms (query/join/blockChildren/blockParent) are only valid
    at a facet-tree ROOT in this flattened rendering — nested levels
    recompute parent bucket keys over the same frame, so a mid-tree
    row-set switch would break the composite-key pass; pure filter
    domains compose anywhere."""
    domain = spec.get("domain")
    if not domain:
        return df
    switching = {"query", "join", "blockChildren", "blockParent"} & set(domain)
    if switching and parents:
        raise NotImplementedError(
            f"domain {sorted(switching)} below the facet root isn't "
            "expressible in the flattened one-pass rendering; restructure "
            "as a top-level facet over the transformed domain")
    base = df
    current = df
    if "query" in domain:
        current = base.where(F.expr(domain["query"]))
    filters = domain.get("filter", [])
    if isinstance(filters, str):
        filters = [filters]
    if "join" in domain:
        j = domain["join"]
        keys = current.select(F.col(j["from"]).alias(j["to"])).distinct()
        current = base.join(keys, j["to"], "left_semi")
    if "blockChildren" in domain:
        pmask = F.expr(domain["blockChildren"])
        roots = current.where(pmask).select("_root_").distinct()
        current = (base.where(~pmask)
                   .join(roots, "_root_", "left_semi"))
        for f_ in filters:               # acceptDocs inside toChildren
            current = current.where(F.expr(f_))
        return current
    if "blockParent" in domain:
        pmask = F.expr(domain["blockParent"])
        roots = current.select("_root_").distinct()
        current = base.where(pmask).join(roots, "_root_", "left_semi")
    for f_ in filters:
        current = current.where(F.expr(f_))
    return current


def _level_filter(df: DataFrame, spec: dict) -> DataFrame:
    typ = spec.get("type", "terms")
    if typ == "range":
        f = spec["field"]
        return df.where((F.col(f) >= F.lit(spec["start"]))
                        & (F.col(f) < F.lit(spec["end"])))
    if typ == "query":
        return df.where(F.expr(spec["q"]))
    return df


def json_facet(df: DataFrame, request: dict) -> DataFrame:
    """Compile ``request`` (the value of Solr's ``json.facet``) over
    ``df`` and return the flattened bucket frame. ``request`` maps
    facet names to facet dicts (sub-aggs at the TOP level are not
    meaningful in Solr either — use a query facet)."""
    outs = []
    for name, spec in request.items():
        outs.append(_compile_level(df, name, spec, parents=[]))
    if len(outs) == 1:
        return outs[0]
    # distinct facets at the same level are independent frames —
    # union them with aligned columns (missing cols → null)
    all_cols: list[str] = []
    for o in outs:
        for c in o.columns:
            if c not in all_cols:
                all_cols.append(c)
    aligned = [
        o.select([F.col(c) if c in o.columns
                  else F.lit(None).alias(c) for c in all_cols])
        for o in outs]
    res = aligned[0]
    for o in aligned[1:]:
        res = res.unionByName(o)
    return res


def _compile_level(df: DataFrame, name: str, spec: dict,
                   parents: list[tuple[str, dict]]) -> DataFrame:
    """One facet level: group by all parent buckets + this bucket,
    aggregate, apply mincount/sort/limit (limit per PARENT bucket via
    a rank window), then recurse into subfacets."""
    aggs, subs = _split(spec.get("facet"))
    typ = spec.get("type", "terms")
    limit = int(spec.get("limit", 10))
    mincount = int(spec.get("mincount", 1 if typ == "terms" else 0))
    sort = str(spec.get("sort", "count desc" if typ == "terms"
                         else "index asc"))

    df = _apply_domain(df, spec, parents)
    scoped = _level_filter(df, spec)
    for _pn, pspec in parents:
        scoped = _level_filter(scoped, pspec)

    # parent bucket values are recomputed expressions over the raw
    # frame — the composite groupBy key makes the whole nested facet
    # ONE aggregation pass per level
    key_exprs = [_bucket_col(pn, pspec).alias(f"{pn}_val")
                 for pn, pspec in parents]
    this_key = _bucket_col(name, spec).alias(f"{name}_val")

    agg_cols = [F.count("*").alias(f"{name}_count")]
    agg_cols += [_agg_column(s, n) for n, s in aggs.items()]

    grouped = (scoped
               .groupBy(*key_exprs, this_key)
               .agg(*agg_cols))
    if typ == "query":
        grouped = grouped.where(F.col(f"{name}_val"))
    if mincount > 0:
        grouped = grouped.where(F.col(f"{name}_count") >= mincount)

    # sort + per-parent limit
    field_, _, dir_ = sort.partition(" ")
    dir_ = (dir_ or "desc").strip()
    if field_ == "count":
        order = F.col(f"{name}_count")
    elif field_ == "index":
        order = F.col(f"{name}_val")
    else:
        if field_ not in aggs:
            raise ValueError(f"sort references unknown agg {field_!r}")
        order = F.col(field_)
    order = order.asc() if dir_ == "asc" else order.desc()
    w = (Window.partitionBy(*[F.col(f"{pn}_val") for pn, _ in parents])
         .orderBy(order, F.col(f"{name}_val").asc())
         if parents else
         Window.orderBy(order, F.col(f"{name}_val").asc()))
    limited = (grouped.withColumn("_rank", F.row_number().over(w))
               .where(F.col("_rank") <= limit).drop("_rank"))

    if not subs:
        return limited

    if len(subs) > 1:
        # two sibling subfacets would cross-product in a single flat
        # frame; issue them as separate top-level requests instead
        raise NotImplementedError(
            "one subfacet per level in the flattened rendering; "
            "sibling subfacets belong in separate json_facet calls "
            "(sub-AGGS are unlimited — they share the groupBy)")
    (child_name, child_spec), = subs.items()
    child = _compile_level(df, child_name, child_spec,
                           parents + [(name, spec)])
    join_keys = [f"{pn}_val" for pn, _ in parents] + [f"{name}_val"]
    return limited.join(child, join_keys, "left")


def to_buckets(rows, name: str) -> list[dict]:
    """Driver-side re-shape of the flattened frame into the
    reference's response shape for ONE top-level facet: a list of
    ``{"val": ..., "count": ...,  <aggs/subfacets>...}`` buckets."""
    out: dict = {}
    for r in rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        val = d[f"{name}_val"]
        b = out.setdefault(val, {"val": val, "count": d[f"{name}_count"]})
        for k, v in d.items():
            if k.endswith("_val") or k.endswith("_count"):
                continue
            b[k] = v
    return sorted(out.values(), key=lambda b: (-b["count"], str(b["val"])))
