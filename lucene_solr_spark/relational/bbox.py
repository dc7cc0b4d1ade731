"""BBoxStrategy: bounding-box spatial operations + overlap-ratio
relevancy.

Reference: ``lucene/spatial-extras/src/java/org/apache/lucene/spatial/
bbox/`` —

* ``BBoxStrategy.java`` (:249-276 ``makeQuery``): a stored rectangle
  (minX/maxX/minY/maxY numeric fields) queried under the
  SpatialOperation set — BBoxIntersects / Intersects, BBoxWithin /
  IsWithin, Contains, IsEqualTo, IsDisjointTo (Overlaps unsupported,
  :58). Each operation is a conjunction of per-axis range predicates
  (:278-330) — here one Catalyst conjunction per op, sargable, pruned
  by Parquet row-group stats exactly like the reference's DoublePoint
  range queries.
* ``BBoxOverlapRatioValueSource.java`` (:131-248): the GeoPortal-style
  relevancy — ``score = queryRatio * p + targetRatio * (1-p)`` where
  queryRatio = intersectionArea/queryArea (degenerate line/point
  rectangles fall back to height/width ratios, :194-217),
  ``calcArea(w, h) = max(minSide, w) * max(minSide, h)`` (:245-248),
  and the intersection width handles a dateline-crossing QUERY box by
  summing the west and east portions (:143-190). The query rectangle
  is a compile-time constant, so the crossing/non-crossing branch is
  chosen statically and the whole score is ONE codegen'd Column — no
  UDF. Stored boxes must not cross the dateline (the reference indexes
  such boxes with an extra ``xdl`` flag field; our corpus schema
  stores plain minX <= maxX rectangles).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .suite import load_table, register

BBOX_OPS = ("intersects", "within", "contains", "equals", "disjoint")


def _axis(mn: Column, mx: Column, qmin: float, qmax: float,
          op: str) -> Column:
    if op == "intersects":
        return (mx >= F.lit(qmin)) & (mn <= F.lit(qmax))
    if op == "within":      # stored box inside the query box
        return (mn >= F.lit(qmin)) & (mx <= F.lit(qmax))
    if op == "contains":    # stored box contains the query box
        return (mn <= F.lit(qmin)) & (mx >= F.lit(qmax))
    if op == "equals":
        return (mn == F.lit(qmin)) & (mx == F.lit(qmax))
    raise ValueError(op)


def bbox_predicate(query: tuple[float, float, float, float], op: str,
                   minx: str = "minx", maxx: str = "maxx",
                   miny: str = "miny", maxy: str = "maxy") -> Column:
    """SpatialOperation → boolean Column (BBoxStrategy.makeQuery
    :259-268; per-axis decompositions :278-330). ``query`` =
    (qMinX, qMaxX, qMinY, qMaxY), all bounds inclusive."""
    if op not in BBOX_OPS:
        raise ValueError(f"op must be one of {BBOX_OPS}")
    qminx, qmaxx, qminy, qmaxy = query
    if op == "disjoint":
        # makeDisjoint (:362-377): NOT intersects on either axis
        return ~bbox_predicate(query, "intersects", minx, maxx, miny, maxy)
    return (_axis(F.col(minx), F.col(maxx), qminx, qmaxx, op)
            & _axis(F.col(miny), F.col(maxy), qminy, qmaxy, op))


def bbox_overlap_ratio(
    query: tuple[float, float, float, float],
    query_target_proportion: float = 0.25,
    min_side_length: float = 0.0,
    minx: str = "minx", maxx: str = "maxx",
    miny: str = "miny", maxy: str = "maxy",
    geo: bool = True,
) -> Column:
    """BBoxOverlapRatioValueSource.score (:131-242) as one Column.

    Defaults mirror the reference's convenience ctor (:95-98):
    queryTargetProportion 0.25 ("75% weighting towards target,
    roughly GeoPortal's default"), no minimum side length.
    """
    if not 0.0 <= query_target_proportion <= 1.0:
        raise ValueError("queryTargetProportion must be >= 0 and <= 1")
    qminx, qmaxx, qminy, qmaxy = query
    crosses = geo and qminx > qmaxx
    dmin_x, dmax_x = F.col(minx), F.col(maxx)
    dmin_y, dmax_y = F.col(miny), F.col(maxy)

    # height (:133-141)
    top = F.least(F.lit(qmaxy), dmax_y)
    bottom = F.greatest(F.lit(qminy), dmin_y)
    height = top - bottom

    if not crosses:
        # both non-crossing (:149-158); the geo both-adjacent-to-
        # dateline corner (:155-157) yields width 0, which the main
        # branch already produces when left == right == ±180
        left = F.greatest(F.lit(qminx), dmin_x)
        right = F.least(F.lit(qmaxx), dmax_x)
        width = right - left
        no_x = left > right
        q_width = qmaxx - qminx
    else:
        # query crosses the dateline, stored box doesn't (:167-189)
        w_left = F.greatest(F.lit(qminx), dmin_x)
        w_right = dmax_x
        e_left = dmin_x
        e_right = F.least(F.lit(qmaxx), dmax_x)
        width = (
            F.when(w_left < w_right, w_right - w_left).otherwise(F.lit(0.0))
            + F.when(e_left < e_right, e_right - e_left).otherwise(F.lit(0.0))
        )
        no_x = (w_left >= w_right) & (e_left >= e_right)
        q_width = (qmaxx - qminx) + 360.0

    def calc_area_const(w: float, h: float) -> float:
        return max(min_side_length, w) * max(min_side_length, h)

    def calc_area(w: Column, h: Column) -> Column:
        return (F.greatest(F.lit(min_side_length), w)
                * F.greatest(F.lit(min_side_length), h))

    q_height = qmaxy - qminy
    query_area = calc_area_const(q_width, q_height)
    inter_area = calc_area(width, height)

    # queryRatio (:194-203): degenerate query rectangles fall back to
    # 1-dim ratios, then to intersects()∈{0,1}
    if query_area > 0:
        query_ratio = inter_area / F.lit(query_area)
    elif q_height > 0:
        query_ratio = height / F.lit(q_height)
    elif q_width > 0:
        query_ratio = width / F.lit(q_width)
    else:
        query_ratio = F.lit(1.0)  # point query reaching here intersects

    # targetRatio (:205-217), same ladder over the stored box
    t_width = dmax_x - dmin_x
    t_height = dmax_y - dmin_y
    target_area = calc_area(t_width, t_height)
    target_ratio = (
        F.when(target_area > 0, inter_area / target_area)
        .when(t_height > 0, height / t_height)
        .when(t_width > 0, width / t_width)
        .otherwise(F.lit(1.0))
    )

    score = (query_ratio * F.lit(query_target_proportion)
             + target_ratio * F.lit(1.0 - query_target_proportion))
    # no-intersection → 0 (:136-141 height, :152-158/:183-188 width)
    return (F.when(height < 0, F.lit(0.0))
            .when(no_x, F.lit(0.0))
            .otherwise(score))


# ---------------------------------------------------------------------------
# Driver row: boxes derived from events; the oracle SQL re-derives the
# overlap-ratio formula straight from the reference's pseudocode —
# independent of the Column builder above.
# ---------------------------------------------------------------------------

_QRECT = (-20.0, 30.0, -10.0, 40.0)   # (qMinX, qMaxX, qMinY, qMaxY)
_QTP = 0.25

_BBOX_ORACLE = f"""
WITH boxes AS (
  SELECT event_id,
         CAST((event_id * 11) % 340 - 170 AS DOUBLE) AS minx,
         CAST((event_id * 11) % 340 - 170 + (event_id % 10) + 1 AS DOUBLE) AS maxx,
         CAST((event_id * 17) % 160 - 80 AS DOUBLE) AS miny,
         CAST((event_id * 17) % 160 - 80 + (event_id % 7) + 1 AS DOUBLE) AS maxy
  FROM events
), scored AS (
  SELECT event_id, minx, maxx, miny, maxy,
         least({_QRECT[3]}, maxy) - greatest({_QRECT[2]}, miny) AS h,
         least({_QRECT[1]}, maxx) - greatest({_QRECT[0]}, minx) AS w
  FROM boxes
), ratio AS (
  SELECT event_id,
         CASE WHEN h < 0 OR w < 0 THEN 0.0
              ELSE (w * h) / (({_QRECT[1]} - {_QRECT[0]}) * ({_QRECT[3]} - {_QRECT[2]})) * {_QTP}
                   + (w * h) / ((maxx - minx) * (maxy - miny)) * {1.0 - _QTP}
         END AS score
  FROM scored
)
SELECT event_id, round(score, 4) AS score
FROM ratio
WHERE score > 0
ORDER BY round(score, 4) DESC, event_id
LIMIT 15
"""


@register("bbox_overlap_topk", _BBOX_ORACLE)
def bbox_overlap_topk(spark, sf_dir):
    """BBoxStrategy + BBoxOverlapRatioValueSource: top-15 stored boxes
    by overlap-ratio relevancy against a query rectangle — filter =
    the Intersects spatial operation, score = the GeoPortal ratio, one
    scan, pure Catalyst."""
    ev = load_table(spark, sf_dir, "events")
    boxes = ev.select(
        "event_id",
        ((F.col("event_id") * 11) % 340 - 170).cast("double").alias("minx"),
        ((F.col("event_id") * 11) % 340 - 170 + (F.col("event_id") % 10) + 1)
        .cast("double").alias("maxx"),
        ((F.col("event_id") * 17) % 160 - 80).cast("double").alias("miny"),
        ((F.col("event_id") * 17) % 160 - 80 + (F.col("event_id") % 7) + 1)
        .cast("double").alias("maxy"),
    )
    score = bbox_overlap_ratio(_QRECT, _QTP)
    return (
        boxes.where(bbox_predicate(_QRECT, "intersects"))
        .select("event_id", F.round(score, 4).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(15)
    )
