"""BBoxStrategy spatial operations + BBoxOverlapRatioValueSource.

Goldens hand-computed from the reference's score pseudocode
(spatial-extras/bbox/BBoxOverlapRatioValueSource.java:131-242) and the
makeQuery operation decompositions (BBoxStrategy.java:249-330).
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.relational.bbox import (
    bbox_overlap_ratio,
    bbox_predicate,
)

BOXES = [
    # label, minx, maxx, miny, maxy
    ("inside", 0.0, 10.0, 0.0, 10.0),
    ("equal", -20.0, 30.0, -10.0, 40.0),
    ("covering", -30.0, 40.0, -20.0, 50.0),
    ("overlap_left", -40.0, -10.0, 0.0, 10.0),
    ("disjoint", 100.0, 110.0, 0.0, 10.0),
    ("touching", 30.0, 40.0, 0.0, 10.0),   # shares the x=30 edge
]
QRECT = (-20.0, 30.0, -10.0, 40.0)


@pytest.fixture()
def box_df(spark):
    return spark.createDataFrame(
        BOXES, "label string, minx double, maxx double, miny double, "
               "maxy double")


def _labels(df, pred):
    return {r.label for r in df.where(pred).collect()}


def test_spatial_operations(box_df):
    assert _labels(box_df, bbox_predicate(QRECT, "intersects")) == {
        "inside", "equal", "covering", "overlap_left", "touching"}
    assert _labels(box_df, bbox_predicate(QRECT, "within")) == {
        "inside", "equal"}
    assert _labels(box_df, bbox_predicate(QRECT, "contains")) == {
        "equal", "covering"}
    assert _labels(box_df, bbox_predicate(QRECT, "equals")) == {"equal"}
    assert _labels(box_df, bbox_predicate(QRECT, "disjoint")) == {"disjoint"}


def test_overlap_ratio_goldens(box_df):
    # queryArea = 50*50 = 2500, p = 0.25
    rows = {r.label: r.s for r in box_df.select(
        "label", bbox_overlap_ratio(QRECT, 0.25).alias("s")).collect()}
    # inside: intersection = its own 10x10=100 → qr=100/2500=0.04,
    # tr=1.0 → 0.04*0.25 + 1.0*0.75
    assert rows["inside"] == pytest.approx(0.04 * 0.25 + 0.75)
    # equal: both ratios 1 → 1.0
    assert rows["equal"] == pytest.approx(1.0)
    # covering: intersection = query 2500; target area 70*70=4900 →
    # qr=1, tr=2500/4900
    assert rows["covering"] == pytest.approx(0.25 + (2500 / 4900) * 0.75)
    # overlap_left: w = -10-(-20)=10, h = 10-0=10 → 100;
    # target area 30*10=300 → qr=0.04, tr=1/3
    assert rows["overlap_left"] == pytest.approx(
        (100 / 2500) * 0.25 + (100 / 300) * 0.75)
    # disjoint → 0; touching: w=0 → both ratios 0 → score 0
    assert rows["disjoint"] == 0.0
    assert rows["touching"] == 0.0


def test_overlap_ratio_degenerate_target(spark):
    # vertical-line target: targetArea 0, height>0 → targetRatio =
    # interHeight / targetHeight (:209-211)
    df = spark.createDataFrame(
        [("vline", 0.0, 0.0, -30.0, 10.0)],
        "label string, minx double, maxx double, miny double, maxy double")
    s = df.select(bbox_overlap_ratio(QRECT, 0.25).alias("s")).collect()[0].s
    # intersection h = 10-(-10)=20, w = 0; interArea=0 → qr=0;
    # tr = 20/40 = 0.5
    assert s == pytest.approx(0.0 * 0.25 + 0.5 * 0.75)


def test_overlap_ratio_dateline_crossing_query(spark):
    # query box crossing the dateline: west part [170,180], east part
    # [-180,-160] (:167-189)
    q = (170.0, -160.0, 0.0, 10.0)
    df = spark.createDataFrame(
        [("west", 175.0, 180.0, 0.0, 10.0),
         ("east", -180.0, -170.0, 0.0, 10.0),
         ("both", -175.0, 178.0, 0.0, 10.0),  # huge box over both arms
         ("out", 0.0, 50.0, 0.0, 10.0)],
        "label string, minx double, maxx double, miny double, maxy double")
    rows = {r.label: r.s for r in df.select(
        "label", bbox_overlap_ratio(q, 0.25).alias("s")).collect()}
    # query width = (-160-170)+360 = 30, height 10 → area 300
    # west: w = 180-175 = 5, h = 10 → 50; target 5*10=50 → tr=1
    assert rows["west"] == pytest.approx((50 / 300) * 0.25 + 1.0 * 0.75)
    # east: w = -170-(-180) = 10 → 100; target 100 → tr=1
    assert rows["east"] == pytest.approx((100 / 300) * 0.25 + 1.0 * 0.75)
    # both arms: west part max(170,-175)=170→178 = 8; east part
    # -175→min(-160,178)=-160 = 15; w=23, area 230; target 353*10
    assert rows["both"] == pytest.approx(
        (230 / 300) * 0.25 + (230 / 3530) * 0.75)
    assert rows["out"] == 0.0


def test_min_side_length(spark):
    # minSideLength lifts degenerate intersection dimensions
    # (calcArea :245-248)
    df = spark.createDataFrame(
        [("thin", 0.0, 10.0, 40.0, 50.0)],   # touches query top edge
        "label string, minx double, maxx double, miny double, maxy double")
    s0 = df.select(bbox_overlap_ratio(QRECT, 0.25, 0.0).alias("s")
                   ).collect()[0].s
    s1 = df.select(bbox_overlap_ratio(QRECT, 0.25, 1.0).alias("s")
                   ).collect()[0].s
    assert s0 == 0.0
    # h=0→lifted to 1, w=10 → inter=10; queryArea=max(1,50)*max(1,50)
    # unchanged 2500; target 10*10=100
    assert s1 == pytest.approx((10 / 2500) * 0.25 + (10 / 100) * 0.75)


def test_validation():
    with pytest.raises(ValueError):
        bbox_overlap_ratio(QRECT, 1.5)
    with pytest.raises(ValueError):
        bbox_predicate(QRECT, "overlaps")  # unsupported, as in :58


def test_plan_stays_jvm(box_df):
    plan = box_df.select(bbox_overlap_ratio(QRECT).alias("s"))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
