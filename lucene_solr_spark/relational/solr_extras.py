"""Solr component surfaces: term vectors, interval facets, uniqueBlock
block-join facet, spatial heatmap facet.

Each entry follows the suite conventions (identical aliases both
sides, rounded floats, tagged unions) so the driver's DuckDB gate
value-hashes them. Reference mappings cited per entry.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import functions as F

from .suite import _TOK_SQL, _tokens, load_table, register

# ---------------------------------------------------------------------------
# Interval facets — solr/core/src/java/org/apache/solr/request/
# IntervalFacets.java (FacetInterval.parse, :359-470): Solr interval
# syntax `[start,end)` etc., `*` = unbounded, `\,` escapes a comma.
# A doc may fall in several intervals (unlike facet.range buckets).
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(r"^\s*([\[\(])(.*),(.*?)([\]\)])\s*$")


@dataclass(frozen=True)
class FacetInterval:
    """One parsed interval; raw string kept as the bucket label
    (IntervalFacets.FacetInterval keeps the key = the input)."""

    raw: str
    start: float | None  # None = unbounded (*)
    end: float | None
    start_inclusive: bool
    end_inclusive: bool

    def contains(self, v: float) -> bool:
        if self.start is not None:
            if v < self.start or (v == self.start and not self.start_inclusive):
                return False
        if self.end is not None:
            if v > self.end or (v == self.end and not self.end_inclusive):
                return False
        return True


def parse_interval(spec: str) -> FacetInterval:
    """Parse Solr interval-facet syntax.

    `[a,b]` inclusive, `(a,b)` exclusive, mixed brackets allowed,
    `*` for unbounded start/end (IntervalFacets.java:376-417 —
    `(*` ≡ `[*` and `*)` ≡ `*]`, the star is never a real endpoint).
    Raises ValueError on malformed input or start > end
    (IntervalFacets.java:441-444 SyntaxError semantics).
    """
    m = _INTERVAL_RE.match(spec.replace("\\,", "\x00"))
    if not m:
        raise ValueError(f"bad interval syntax: {spec!r}")
    lb, s_raw, e_raw, rb = m.groups()
    s_raw = s_raw.replace("\x00", ",").strip()
    e_raw = e_raw.replace("\x00", ",").strip()
    start = None if s_raw == "*" else float(s_raw)
    end = None if e_raw == "*" else float(e_raw)
    if start is not None and end is not None and start > end:
        raise ValueError(f"start > end in interval: {spec!r}")
    return FacetInterval(
        raw=spec.strip(),
        start=start,
        end=end,
        start_inclusive=(lb == "[") or start is None,
        end_inclusive=(rb == "]") or end is None,
    )


def interval_condition(col, iv: FacetInterval):
    """The interval as a Column predicate (pure JVM comparisons)."""
    cond = F.lit(True)
    if iv.start is not None:
        cond = cond & (col >= iv.start if iv.start_inclusive else col > iv.start)
    if iv.end is not None:
        cond = cond & (col <= iv.end if iv.end_inclusive else col < iv.end)
    return cond


def _interval_sql(col: str, iv: FacetInterval) -> str:
    parts = []
    if iv.start is not None:
        parts.append(f"{col} >{'=' if iv.start_inclusive else ''} {iv.start!r}")
    if iv.end is not None:
        parts.append(f"{col} <{'=' if iv.end_inclusive else ''} {iv.end!r}")
    return " AND ".join(parts) or "TRUE"


# overlapping on purpose: interval facets are NOT a partition of the
# domain (IntervalFacets.java javadoc — "intervals can overlap")
_QTY_INTERVALS = ["[*,10)", "[10,25)", "[25,*]", "(15,30]", "[20,20]"]


def interval_facets(df, col: str, specs: list[str]):
    """facet.interval over a numeric column: ONE aggregate pass with a
    conditional count per interval (no explode, no per-interval scan),
    then an unpivot to (interval, n) rows — the DocValues single-pass
    accumulation of IntervalFacets.accumIntervalsSingle
    (IntervalFacets.java:243-280) as map-side-combinable Spark aggs."""
    ivs = [parse_interval(s) for s in specs]
    aggs = [
        F.sum(interval_condition(F.col(col), iv).cast("long")).alias(f"_iv{i}")
        for i, iv in enumerate(ivs)
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{iv.raw}', _iv{i}" for i, iv in enumerate(ivs))
    return wide.selectExpr(
        f"stack({len(ivs)}, {stack}) AS (interval, n)"
    ).select("interval", F.col("n").cast("long").alias("n"))


_IV_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{s}' AS interval, "
    f"count(CASE WHEN {_interval_sql('l_quantity', parse_interval(s))} THEN 1 END) AS n "
    f"FROM lineitem"
    for s in _QTY_INTERVALS
)


@register("interval_facets", _IV_ORACLE)
def interval_facets_entry(spark, sf_dir):
    """IntervalFacets over lineitem.l_quantity with overlapping Solr
    interval syntax incl. unbounded `*` endpoints and a singleton
    `[20,20]` (request/IntervalFacets.java:359-470 parse +
    :243-280 single-pass accumulation)."""
    li = load_table(spark, sf_dir, "lineitem")
    return interval_facets(li, "l_quantity", _QTY_INTERVALS)


# ---------------------------------------------------------------------------
# uniqueBlock — solr/core/src/java/org/apache/solr/search/facet/
# UniqueBlockAgg.java: facet CHILD docs but count each parent block
# once (the block-join facet; BlockJoinFacetComponent role).
# ---------------------------------------------------------------------------
@register(
    "unique_block_facet",
    """
    SELECT l_returnflag,
           count(*) AS child_count,
           count(DISTINCT l_orderkey) AS unique_block
    FROM lineitem WHERE l_quantity >= 30
    GROUP BY l_returnflag
    """,
)
def unique_block_facet(spark, sf_dir):
    """uniqueBlock(_root_) facet: children (lineitem) bucketed by a
    child field, counting distinct PARENTS (orders) per bucket
    (search/facet/UniqueBlockAgg.java:62-75 — parent docid stands for
    the block; l_orderkey IS the parent key here, so countDistinct is
    the exact agg, partial-aggregated map-side by Spark). child_count
    alongside shows the regular count for contrast."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 30)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("child_count"),
            F.countDistinct("l_orderkey").alias("unique_block"),
        )
    )


# ---------------------------------------------------------------------------
# Term vectors — solr/core/src/java/org/apache/solr/handler/component/
# TermVectorComponent.java (process, :219-333): per-doc term vectors
# with tf, global df, and tf-idf = tf/df for the selected docs.
# ---------------------------------------------------------------------------
@register(
    "term_vectors",
    f"""
    WITH tok AS ({_TOK_SQL}),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    tv AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE doc_id < 40 GROUP BY doc_id, term
    )
    SELECT tv.doc_id, tv.term, tv.tf, df.df,
           round(cast(tv.tf AS DOUBLE) / df.df, 6) AS tf_idf
    FROM tv JOIN df ON df.term = tv.term
    """,
)
def term_vectors(spark, sf_dir):
    """TermVectorComponent: for each selected doc, its term vector
    (term, tf) joined with corpus-wide df and tf-idf = tf/df
    (TermVectorComponent.java:219-333; df/tf-idf per the tv.df /
    tv.tf_idf flags). The per-doc tf agg runs on the filtered slice;
    the df side aggregates the full corpus once and joins on term —
    at scale that df table IS the term dictionary the index already
    maintains (dict/ tables in the engine), so the join is a
    broadcast of precomputed stats, not a recount."""
    tok = _tokens(spark, sf_dir)
    df_tbl = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tv = (
        tok.where(F.col("doc_id") < 40)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return tv.join(df_tbl, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") / F.col("df"), 6).alias("tf_idf"),
    )


# ---------------------------------------------------------------------------
# Heatmap facet — solr/core/.../handler/component/SpatialHeatmapFacets
# + lucene/spatial-extras/.../prefix/HeatmapFacetCounter.java: counts
# per grid cell over a bbox at a given grid level.
# ---------------------------------------------------------------------------

# synthetic deterministic coordinates — same arithmetic as geo_suite
from .suite import _LAT, _LON  # noqa: E402

_HM = {"lat_min": -90.0, "lat_max": 90.0, "lon_min": -180.0,
       "lon_max": 180.0, "cell": 15.0}


@register(
    "facet_heatmap",
    f"""
    SELECT CAST(floor(({_LAT} - {_HM["lat_min"]}) / {_HM["cell"]}) AS INT) AS grid_row,
           CAST(floor(({_LON} - {_HM["lon_min"]}) / {_HM["cell"]}) AS INT) AS grid_col,
           count(*) AS n
    FROM customer
    WHERE {_LAT} >= {_HM["lat_min"]} AND {_LAT} < {_HM["lat_max"]}
      AND {_LON} >= {_HM["lon_min"]} AND {_LON} < {_HM["lon_max"]}
    GROUP BY 1, 2
    """,
)
def facet_heatmap(spark, sf_dir):
    """facet.heatmap: 2D grid-cell counts over a bounding box
    (HeatmapFacetCounter.java:87-130 — counts per cell of a
    grid-level raster; SpatialHeatmapFacets parses the request).
    Sparse output: only non-empty cells, as (grid_row, grid_col, n) —
    the reference emits a dense counts2D array, but at 100 TB the
    sparse groupBy IS the scalable form (map-side combine, one
    shuffle on the cell key) and densifying k×k cells is a driver-side
    reshape of at most rows×cols entries."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = F.expr(_LAT), F.expr(_LON)
    row = F.floor((lat - _HM["lat_min"]) / _HM["cell"]).cast("int")
    col = F.floor((lon - _HM["lon_min"]) / _HM["cell"]).cast("int")
    return (
        c.where((lat >= _HM["lat_min"]) & (lat < _HM["lat_max"])
                & (lon >= _HM["lon_min"]) & (lon < _HM["lon_max"]))
        .groupBy(row.alias("grid_row"), col.alias("grid_col"))
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Graph traversal — solr/solrj/src/java/org/apache/solr/client/solrj/
# io/graph/GatherNodesStream.java + ShortestPathStream.java, one
# tagged union row. Graph: the bipartite customer<->supplier purchase
# graph from orders |><| lineitem, node labels 'c<key>' / 's<key>'.
# ---------------------------------------------------------------------------

_EDGES_SQL = """
    SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
           's' || CAST(l.l_suppkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
           'c' || CAST(o.o_custkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""

_GRAPH_ORACLE = f"""
    WITH edges AS ({_EDGES_SQL}),
    roots AS (SELECT unnest(['c1', 'c2', 'c3']) AS node),
    l1 AS (
      SELECT e.dst AS node, count(*) AS n_in FROM edges e
      JOIN roots r ON e.src = r.node GROUP BY e.dst
    ),
    l2 AS (
      SELECT e.dst AS node, count(*) AS n_in FROM edges e
      JOIN l1 ON e.src = l1.node
      WHERE e.dst NOT IN (SELECT node FROM roots)
        AND e.dst NOT IN (SELECT node FROM l1)
      GROUP BY e.dst
    ),
    de AS (SELECT DISTINCT src, dst FROM edges),
    p1 AS (
      SELECT de.dst AS node, 'c1->' || de.dst AS path FROM de
      WHERE de.src = 'c1'
    ),
    p2 AS (
      SELECT de.dst AS node, p1.path || '->' || de.dst AS path
      FROM p1 JOIN de ON de.src = p1.node
      WHERE p1.node <> 'c42' AND de.dst <> 'c1'
    )
    SELECT 'gather' AS op, 0 AS level, node, CAST(0 AS BIGINT) AS n_in
    FROM roots
    UNION ALL
    SELECT 'gather' AS op, 1 AS level, node, n_in FROM l1
    UNION ALL
    SELECT 'gather' AS op, 2 AS level, node, n_in FROM l2
    UNION ALL
    SELECT 'path' AS op, 1 AS level, path AS node, CAST(-1 AS BIGINT) AS n_in
    FROM p1 WHERE node = 'c42'
    UNION ALL
    SELECT 'path' AS op, 2 AS level, path AS node, CAST(-1 AS BIGINT) AS n_in
    FROM p2 WHERE node = 'c42'
      AND NOT EXISTS (SELECT 1 FROM p1 WHERE p1.node = 'c42')
"""


def _purchase_edges(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (o.join(li, o.o_orderkey == li.l_orderkey)
         .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
                 F.concat(F.lit("s"), F.col("l_suppkey")).alias("s")))
    fwd = e.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = e.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionByName(rev)


@register("graph_traversal", _GRAPH_ORACLE)
def graph_traversal(spark, sf_dir):
    """gatherNodes + shortestPath, via the streaming-expression
    language itself (the `nodes`/`shortestPath` stream functions
    compile to frontier-join BFS in streaming/graph.py):

    * gather leg — 2-level breadth-first gather from seed customers
      {c1,c2,c3} with trackTraversal=true and scatter=branches,leaves
      (GatherNodesStream.java:175,205-214,557-603): level 0 roots,
      level 1 suppliers with incoming-edge counts, level 2 customers
      excluding every earlier-level node;
    * path leg — every shortest path c1 -> c42 over the DISTINCT edge
      relation (ShortestPathStream.java:40-48), emitted as
      '->'-joined strings at their BFS depth.
    """
    from ..streaming.expressions import StreamFactory

    # the edge relation is an orders⋈lineitem join consumed by EVERY
    # BFS level of both legs (~8 scans) — materialize it once; the
    # distinct variant rides the same cache
    edges = _purchase_edges(spark, sf_dir).persist()
    roots = spark.createDataFrame([("c1",), ("c2",), ("c3",)], "node string")
    sf = StreamFactory({"edges": edges, "dedges": edges.distinct(),
                        "roots": roots})
    gathered = sf.compile(
        'nodes(edges, search(roots), walk="node->src", gather="dst", '
        'maxLevels=2, trackTraversal=true, scatter="branches,leaves")')
    paths = sf.compile(
        'shortestPath(dedges, from="c1", to="c42", edge="src=dst", '
        'maxDepth=4)')
    gather_rows = gathered.select(
        F.lit("gather").alias("op"), F.col("level").cast("int"),
        "node", F.col("n_in").cast("long"))
    path_rows = paths.select(
        F.lit("path").alias("op"),
        (F.size("path") - 1).cast("int").alias("level"),
        F.array_join("path", "->").alias("node"),
        F.lit(-1).cast("long").alias("n_in"))
    return gather_rows.unionByName(path_rows)


# ---------------------------------------------------------------------------
# FreeTextSuggester — lucene/suggest/.../analyzing/FreeTextSuggester.java:
# n-gram language model, stupid-backoff scoring (see search/freetext.py).
# ---------------------------------------------------------------------------

_FT_CTX = ("big", "table")

_FREETEXT_ORACLE = f"""
    WITH tokf AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS l
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
      FROM tokf
    ),
    c1 AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
    g2 AS (
      SELECT a.term AS w1, b.term AS w2, count(*) AS n
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    g3 AS (
      SELECT a.term AS w1, b.term AS w2, c.term AS w3, count(*) AS n
      FROM tok a
      JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      GROUP BY 1, 2, 3
    ),
    tri AS (
      SELECT w3 AS cand,
             1.0 * n / (SELECT n FROM g2
                        WHERE w1 = '{_FT_CTX[0]}' AND w2 = '{_FT_CTX[1]}') AS score,
             3 AS ord
      FROM g3 WHERE w1 = '{_FT_CTX[0]}' AND w2 = '{_FT_CTX[1]}'
    ),
    bi AS (
      SELECT w2 AS cand,
             0.4 * n / (SELECT n FROM c1 WHERE term = '{_FT_CTX[1]}') AS score,
             2 AS ord
      FROM g2 WHERE w1 = '{_FT_CTX[1]}'
        AND w2 NOT IN (SELECT cand FROM tri)
    )
    SELECT cand, round(score, 6) AS score, CAST(ord AS INT) AS ord
    FROM (SELECT * FROM tri UNION ALL SELECT * FROM bi)
    ORDER BY score DESC, cand ASC LIMIT 10
"""


@register("suggest_freetext", _FREETEXT_ORACLE)
def suggest_freetext(spark, sf_dir):
    """FreeTextSuggester lookup for '<big> <table> ' (trailing space):
    trigram predictions at backoff 1.0, bigram at ALPHA=0.4, higher
    order wins duplicates, top-10 by (score desc, term asc) — exactly
    FreeTextSuggester.java:480-497 (context upgrade), :546-549/:663
    (backoff ladder), :611-654 (seen-dedup), :672-683 (sort)."""
    from ..search.freetext import FreeTextSuggester

    docs = load_table(spark, sf_dir, "documents")
    return FreeTextSuggester(docs, "text").lookup(_FT_CTX, num=10)


# ---------------------------------------------------------------------------
# Field-facet options — solr/core/src/java/org/apache/solr/request/
# SimpleFacets.java (getFacetTermEnumCounts, :917-1046): facet.prefix,
# facet.contains, facet.mincount, facet.missing, facet.sort=count|index,
# facet.offset + facet.limit, in one tagged union row.
# ---------------------------------------------------------------------------
@register(
    "facet_options",
    f"""
    WITH tok AS ({_TOK_SQL}),
    counts AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
    pre AS (
      SELECT 'prefix' AS op, term, n,
             row_number() OVER (ORDER BY n DESC, term ASC) AS rn
      FROM counts WHERE term LIKE 's%' AND n >= 2
    ),
    cont AS (
      SELECT 'contains' AS op, term, n,
             row_number() OVER (ORDER BY term ASC) AS rn
      FROM counts WHERE term LIKE '%ar%' AND n >= 2
    ),
    langf AS (
      SELECT CASE WHEN n_chars % 7 = 0 THEN NULL ELSE lang END AS v
      FROM documents
    )
    SELECT op, term, n FROM pre WHERE rn > 1 AND rn <= 11
    UNION ALL
    SELECT op, term, n FROM cont WHERE rn <= 10
    UNION ALL
    SELECT 'missing' AS op, '' AS term, count(*) AS n
    FROM langf WHERE v IS NULL
    """,
)
def facet_options(spark, sf_dir):
    """SimpleFacets term-facet options over the token stream:

    * prefix leg — facet.prefix='s' + facet.mincount=2 +
      facet.sort=count (count desc, term asc tie-break,
      SimpleFacets.java:917-960) + facet.offset=1 facet.limit=10
      (the page cut applies AFTER sorting, :1014-1024);
    * contains leg — facet.contains='ar' + facet.sort=index
      (lexicographic, :961), limit 10;
    * missing leg — facet.missing=true counts docs with no value in
      the field (:1030-1040), over a deterministically-NULLed lang.

    The prefix predicate is sargable (dict-ordered scan in the
    reference's TermEnum; a LIKE 'sp%' pushdown here); contains is the
    full-scan option in both engines."""
    tok = _tokens(spark, sf_dir)
    counts = tok.groupBy("term").agg(F.count("*").alias("n"))
    from pyspark.sql.window import Window

    pre = (counts.where(F.col("term").startswith("s") & (F.col("n") >= 2))
           .withColumn("rn", F.row_number().over(
               Window.orderBy(F.desc("n"), F.asc("term"))))
           .where((F.col("rn") > 1) & (F.col("rn") <= 11))
           .select(F.lit("prefix").alias("op"), "term", "n"))
    cont = (counts.where(F.col("term").contains("ar") & (F.col("n") >= 2))
            .withColumn("rn", F.row_number().over(
                Window.orderBy(F.asc("term"))))
            .where(F.col("rn") <= 10)
            .select(F.lit("contains").alias("op"), "term", "n"))
    docs = load_table(spark, sf_dir, "documents")
    missing = (docs.select(
        F.when(F.col("n_chars") % 7 == 0, F.lit(None))
        .otherwise(F.col("lang")).alias("v"))
        .where(F.col("v").isNull())
        .agg(F.count("*").alias("n"))
        .select(F.lit("missing").alias("op"), F.lit("").alias("term"), "n"))
    return pre.unionByName(cont).unionByName(missing)


# ---------------------------------------------------------------------------
# Taxonomy facets — lucene/facet/src/java/org/apache/lucene/facet/
# taxonomy/: a hierarchical dim ("region/nation") counted over the
# docs matching a query, child counts rolled up into parents
# (FastTaxonomyFacetCounts.java:97,132 rollup()), then
# getTopChildren(topN, dim, path...) per level (TaxonomyFacets.java:128,
# sorted count desc — tie-break here is label asc for determinism;
# the reference tie-breaks on taxonomy ordinal, an insertion artifact).
# ---------------------------------------------------------------------------

@register(
    "taxonomy_facets",
    """
    WITH matched AS (
      SELECT r.r_name AS region, n.n_name AS nation
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE o.o_orderstatus = 'F'
    ),
    nat AS (
      SELECT region, nation, count(*) AS cnt FROM matched
      GROUP BY region, nation
    ),
    reg AS (
      SELECT region, sum(cnt)::BIGINT AS cnt FROM nat GROUP BY region
    ),
    regr AS (
      SELECT region, cnt,
             row_number() OVER (ORDER BY cnt DESC, region) AS rank
      FROM reg
    ),
    natr AS (
      SELECT region, nation, cnt,
             row_number() OVER (PARTITION BY region
                                ORDER BY cnt DESC, nation) AS rank
      FROM nat
    )
    SELECT region AS path, 1 AS depth, cnt, CAST(rank AS INT) AS rank
    FROM regr
    UNION ALL
    SELECT region || '/' || nation AS path, 2 AS depth, cnt,
           CAST(rank AS INT) AS rank
    FROM natr WHERE rank <= 3
    """,
)
def taxonomy_facets(spark, sf_dir):
    """Hierarchical taxonomy facet counts over a filtered result set:
    dim = region/nation of the ordering customer, query =
    o_orderstatus = 'F'. Depth-1 rows are the rollup() parent counts
    with a global rank; depth-2 rows are getTopChildren(3) within
    each region.

    Scale shape: dims are broadcast joins (region/nation/customer are
    small vs orders — customer broadcasts at TPC-H ratios since it is
    1.5% of orders rows); ONE exchange on the composite dim for the
    leaf counts; the parent rollup re-aggregates the already-tiny leaf
    table, mirroring the reference's children-into-parents rollup()
    rather than re-counting docs."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    matched = (
        orders.where(F.col("o_orderstatus") == "F")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
    )
    leaf = matched.groupBy("region", "nation").agg(F.count("*").alias("cnt"))
    parent = leaf.groupBy("region").agg(F.sum("cnt").alias("cnt"))
    regr = parent.withColumn(
        "rank", F.row_number().over(
            Window.orderBy(F.desc("cnt"), F.asc("region"))))
    natr = leaf.withColumn(
        "rank", F.row_number().over(
            Window.partitionBy("region").orderBy(F.desc("cnt"), F.asc("nation"))))
    d1 = regr.select(F.col("region").alias("path"), F.lit(1).alias("depth"),
                     "cnt", "rank")
    d2 = (natr.where(F.col("rank") <= 3)
          .select(F.concat_ws("/", "region", "nation").alias("path"),
                  F.lit(2).alias("depth"), "cnt", "rank"))
    return d1.unionByName(d2)


# ---------------------------------------------------------------------------
# Payload scoring — lucene/analysis/common/.../payloads/
# DelimitedPayloadTokenFilter.java (token "term|1.5" → term + float
# payload) and lucene/queries/.../payloads/PayloadScoreQuery.java +
# PayloadFunction.java:31-56 (Average/Min/Max/Sum over the payloads of
# the query term's matches in a doc; includeSpanScore=false returns
# the payload function value alone — the Solr {!payload_score} default).
# Payload source here: each doc's FIRST whitespace token is treated as
# a delimited-payload token "<term>|<weight>" derived deterministically
# from the doc (synthetic corpus has no real payloads; the derivation
# term|((doc_id % 7) + 1) is identical in both engines so the oracle
# is exact).
# ---------------------------------------------------------------------------

@register(
    "payload_score",
    """
    WITH toks AS (
      SELECT doc_id,
             lower(string_split(text, ' ')[1]) AS term,
             ((doc_id % 7) + 1)::DOUBLE AS payload
      FROM documents WHERE length(text) > 0
    ),
    hits AS (
      SELECT doc_id, count(*) AS n,
             round(avg(payload), 4) AS avg_p,
             min(payload) AS min_p, max(payload) AS max_p,
             round(sum(payload), 4) AS sum_p
      FROM toks WHERE term = 'the' GROUP BY doc_id
    )
    SELECT doc_id, avg_p, min_p, max_p, sum_p FROM hits
    """,
)
def payload_score(spark, sf_dir):
    """PayloadScoreQuery over a delimited-payload field: for every doc
    matching term 'the' in the payloaded position, the four
    PayloadFunction docScores (avg = payloadScore/numPayloadsSeen per
    AveragePayloadFunction.java:35-40, min/max/sum accumulate per
    currentScore).

    Scale shape: payload extraction is row-local JVM string ops
    (split/element_at); the per-doc aggregate is ONE exchange on
    doc_id — identical to any postings aggregation. At 100 TB payloads
    ride the postings table as an extra float column aligned with
    positions; no separate storage pass."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    toks = docs.select(
        "doc_id",
        F.lower(F.element_at(F.split("text", " "), 1)).alias("term"),
        ((F.col("doc_id") % 7) + 1).cast("double").alias("payload"),
    )
    return (toks.where(F.col("term") == "the")
            .groupBy("doc_id")
            .agg(F.round(F.avg("payload"), 4).alias("avg_p"),
                 F.min("payload").alias("min_p"),
                 F.max("payload").alias("max_p"),
                 F.round(F.sum("payload"), 4).alias("sum_p")))


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery — lucene/queries/.../payloads/
# SpanPayloadCheckQuery.java:141-170 (PayloadChecker: a span match
# survives only if the payload at EVERY position equals the requested
# byte sequence, position by position) behind Solr's
# {!payload_check f=... payloads='2 3'} (PayloadCheckQParserPlugin
# .java:96-103, IntegerEncoder). Payload source: position-derived
# integer payload ((pos % 5) + 1), identical in both engines (the
# synthetic corpus carries no delimited payloads; the derivation is
# the deterministic stand-in, same convention as payload_score).
# ---------------------------------------------------------------------------

_PAYLOAD_CHECK_ORACLE = """
    WITH rawtok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS term,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    )
    SELECT a.doc_id, count(*) AS n_matches
    FROM rawtok a JOIN rawtok b
      ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'big' AND b.term = 'table'
      AND (a.pos % 5) + 1 = 2 AND (b.pos % 5) + 1 = 3
    GROUP BY a.doc_id
"""


@register("payload_check", _PAYLOAD_CHECK_ORACLE)
def payload_check(spark, sf_dir):
    """{!payload_check f=content payloads='2 3'}big table: the phrase
    "big table" restricted to occurrences whose per-position payloads
    equal (2, 3) — SpanPayloadCheckQuery's position-wise payload
    equality gate over the span matches. Emits (doc_id, n_matches).

    Scale shape: payloads ride the token table as one more derived
    column; the check is the standard adjacent-position phrase
    self-join with two extra pushed-down predicates — the payload
    filter PRUNES the join inputs (each side keeps only its payload
    class, ~1/5 of rows) instead of widening them."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"))
    a = toks.where((F.col("term") == "big")
                   & ((F.col("pos") % 5) + 1 == 2)).alias("a")
    b = toks.where((F.col("term") == "table")
                   & ((F.col("pos") % 5) + 1 == 3)).alias("b")
    return (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                   & (F.col("b.pos") == F.col("a.pos") + 1))
            .groupBy(F.col("a.doc_id").alias("doc_id"))
            .agg(F.count("*").alias("n_matches")))


# ---------------------------------------------------------------------------
# scoreNodes — io/stream/ScoreNodesStream.java:227-246, over the
# purchase graph: gather suppliers one hop from seed customers, then
# score each by (f32(ln tf + 1)) × (f32(ln((N+1)/(df+1)) + 1)).
# ---------------------------------------------------------------------------

_SCORE_NODES_ORACLE = f"""
    WITH edges AS ({_EDGES_SQL}),
    roots AS (SELECT unnest(['c1', 'c2', 'c3']) AS node),
    l1 AS (
      SELECT e.dst AS node, count(*) AS n_in FROM edges e
      JOIN roots r ON e.src = r.node GROUP BY e.dst
    ),
    nd AS (SELECT count(DISTINCT src) AS n FROM edges),
    dfreq AS (
      SELECT dst AS node, count(*) AS docFreq
      FROM (SELECT DISTINCT src, dst FROM edges) GROUP BY dst
    )
    SELECT l1.node, l1.n_in,
           coalesce(dfreq.docFreq, 0) AS docFreq,
           (SELECT n FROM nd) AS numDocs,
           CAST(CAST(CAST(ln(CAST(l1.n_in AS DOUBLE)) + 1.0 AS REAL)
                     AS DOUBLE)
                * CAST(CAST(ln((CAST((SELECT n FROM nd) AS DOUBLE) + 1.0)
                               / (CAST(coalesce(dfreq.docFreq, 0)
                                       AS DOUBLE) + 1.0)) + 1.0 AS REAL)
                       AS DOUBLE) AS REAL) AS nodeScore
    FROM l1 LEFT JOIN dfreq USING (node)
"""


@register("graph_score_nodes", _SCORE_NODES_ORACLE)
def graph_score_nodes(spark, sf_dir):
    """scoreNodes(gatherNodes(...)) through the streaming-expression
    language: suppliers one hop from seed customers {c1,c2,c3}, ranked
    by the reference's tf-idf node score with its float32 per-factor
    casts (ScoreNodesStream.java:243)."""
    from ..streaming.expressions import StreamFactory

    edges = _purchase_edges(spark, sf_dir).persist()
    roots = spark.createDataFrame([("c1",), ("c2",), ("c3",)], "node string")
    sf = StreamFactory({"edges": edges, "roots": roots})
    out = sf.compile(
        'scoreNodes(edges, nodes(edges, search(roots), walk="node->src", '
        'gather="dst", maxLevels=1, trackTraversal=true, '
        'scatter="leaves"))')
    return out.select(
        "node", "n_in", "docFreq", "numDocs",
        F.col("nodeScore").cast("float").alias("nodeScore"))


# ---------------------------------------------------------------------------
# Solr range facets with the FULL option surface: facet.range.include
# (lower/upper/edge/outer/all), facet.range.other (before/after/
# between/all/none) and facet.range.hardend —
# RangeFacetRequest.java:564-650 computeRanges (bucket loop with the
# hardend end-clip at :581-586, per-bucket include resolution at
# :601-607, and the before/after/between bound rules at :632-646).
# ---------------------------------------------------------------------------

def compute_range_buckets(start: float, end: float, gap: float,
                          include: frozenset[str] = frozenset({"lower"}),
                          others: frozenset[str] = frozenset(),
                          hardend: bool = False):
    """The reference's computeRanges loop, verbatim: returns
    [(name, low|None, high|None, incl_low, incl_high)] — gap buckets
    named by their low bound, then before/after/between rows. The
    effective ``end`` rounds UP to a whole gap unless hardend
    (RangeFacetRequest.java:581-586)."""
    inc = {s.lower() for s in include}
    if "all" in inc:
        inc |= {"lower", "upper", "edge", "outer"}
    oth = {s.lower() for s in others}
    if "all" in oth:
        oth |= {"before", "after", "between"}
    out = []
    low, eff_end = float(start), float(end)
    while low < eff_end:
        high = low + gap
        if eff_end < high:
            if hardend:
                high = eff_end
            else:
                eff_end = high
        incl_low = "lower" in inc or ("edge" in inc and low == start)
        incl_high = "upper" in inc or ("edge" in inc and high == eff_end)
        out.append((f"{low:g}", low, high, incl_low, incl_high))
        low = high
    if "none" not in oth:
        if "before" in oth:
            out.append(("before", None, float(start), False,
                        "outer" in inc
                        or not ({"lower", "edge"} & inc)))
        if "after" in oth:
            out.append(("after", eff_end, None,
                        "outer" in inc
                        or not ({"upper", "edge"} & inc), False))
        if "between" in oth:
            out.append(("between", float(start), eff_end,
                        bool({"lower", "edge"} & inc),
                        bool({"upper", "edge"} & inc)))
    return out


def range_facets(df, field: str, start: float, end: float, gap: float,
                 include=frozenset({"lower"}), others=frozenset(),
                 hardend: bool = False):
    """One-pass range facets: every bucket (gap buckets + before/after/
    between) is one conditional-count column of a SINGLE aggregation
    over the scan — no per-bucket passes, no shuffle beyond the final
    scalar row — then unpivoted with ``stack`` into (range, count).
    At 100 TB this is one map-side-combined scan regardless of bucket
    count (buckets are display-bounded by construction)."""
    buckets = compute_range_buckets(start, end, gap,
                                    frozenset(include), frozenset(others),
                                    hardend)
    aggs = []
    for i, (_name, lo, hi, il, ih) in enumerate(buckets):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= lo if il else F.col(field) > lo)
        if hi is not None:
            cond = cond & (F.col(field) <= hi if ih else F.col(field) < hi)
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"b{i}"))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{name}', b{i}"
                      for i, (name, *_r) in enumerate(buckets))
    return row.selectExpr(
        f"stack({len(buckets)}, {stack}) AS (range, cnt)")


def _range_facet_oracle() -> str:
    buckets = compute_range_buckets(
        50000, 350000, 75000,
        include=frozenset({"edge"}), others=frozenset({"all"}),
        hardend=True)
    legs = []
    for name, lo, hi, il, ih in buckets:
        conds = []
        if lo is not None:
            conds.append(f"o_totalprice {'>=' if il else '>'} {lo!r}")
        if hi is not None:
            conds.append(f"o_totalprice {'<=' if ih else '<'} {hi!r}")
        where = " AND ".join(conds) or "TRUE"
        legs.append(f"SELECT '{name}' AS range, "
                    f"(SELECT count(*) FROM orders WHERE {where}) AS cnt")
    return "\nUNION ALL\n".join(legs)


@register("facet_range_options", _range_facet_oracle())
def facet_range_options(spark, sf_dir):
    """facet.range over o_totalprice with start=50k end=350k gap=75k,
    include=edge, other=all, hardend=true: 4 gap buckets with only the
    outermost edges closed, plus before/after (bounds flipped open per
    :632-641 since edge already covers them) and between (both edges
    closed)."""
    return range_facets(
        load_table(spark, sf_dir, "orders"), "o_totalprice",
        50000, 350000, 75000,
        include={"edge"}, others={"all"}, hardend=True)


# --- sampled facets (RandomSamplingFacetsCollector) ------------------------

_SAMPLE_BIN = 10

_SAMPLED_FACETS_ORACLE = f"""
WITH hits AS (
  SELECT event_id, event_type FROM events WHERE value > 25
),
sampled AS (
  SELECT event_type, count(*) AS n_sampled
  FROM hits WHERE (event_id * 2654435761) % {_SAMPLE_BIN} = 0
  GROUP BY event_type
),
exact AS (
  SELECT event_type, count(*) AS n_exact FROM hits GROUP BY event_type
),
totals AS (
  SELECT event_type, count(*) AS n_total FROM events GROUP BY event_type
)
SELECT e.event_type,
       coalesce(s.n_sampled, 0) AS n_sampled,
       least(coalesce(s.n_sampled, 0) * {_SAMPLE_BIN}, t.n_total)
         AS n_amortized,
       e.n_exact
FROM exact e
LEFT JOIN sampled s ON e.event_type = s.event_type
JOIN totals t ON e.event_type = t.event_type
ORDER BY e.event_type
"""


@register("sampled_facets", _SAMPLED_FACETS_ORACLE)
def sampled_facets(spark, sf_dir):
    """RandomSamplingFacetsCollector (facet/
    RandomSamplingFacetsCollector.java): facet counts over a SAMPLE of
    the hit set — one doc per bin of ``binSize = 1/samplingRate``
    (:170-181) — then ``amortizeFacetCounts`` (:221-246) scales each
    sampled count back by 1/samplingRate, capped by the value's global
    count upper bound. The reference draws the in-bin survivor with a
    seeded XORShift64 (:52-77); this port substitutes a deterministic
    multiplicative hash on the doc key — same per-bin selection role,
    reproducible across engines and runs (the determinism rule of
    SURVEY §7). One conditional-aggregation scan computes sampled AND
    exact counts (the exact column shows estimate quality); the global
    per-value totals used for the amortization cap are a second tiny
    aggregate of dictionary size, exactly the docFreq-metadata role the
    reference reads from the index."""
    ev = load_table(spark, sf_dir, "events")
    hits = ev.where(F.col("value") > 25)
    in_sample = (F.col("event_id") * 2654435761) % _SAMPLE_BIN == 0
    per_type = hits.groupBy("event_type").agg(
        F.sum(F.when(in_sample, 1).otherwise(0)).cast("long")
        .alias("n_sampled"),
        F.count("*").cast("long").alias("n_exact"),
    )
    totals = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_total"))
    return (
        per_type.join(totals, "event_type")
        .select(
            "event_type", "n_sampled",
            F.least(F.col("n_sampled") * _SAMPLE_BIN, F.col("n_total"))
            .cast("long").alias("n_amortized"),
            "n_exact")
        .orderBy("event_type")
    )
