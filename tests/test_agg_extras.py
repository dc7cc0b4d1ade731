"""hll / percentile aggregation operators (Solr JSON facet HLLAgg /
PercentileAgg roles): the approximate paths are bounded against exact
values; the exact suite entries are driver-oracle-checked."""

from pyspark.sql import functions as F

from lucene_solr_spark.relational.suite import QUERIES, load_table

SF = "/root/testdata/sf0.001"


def test_hll_tracks_exact(spark):
    orders = load_table(spark, SF, "orders")
    rows = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.005).alias("hll"),
        F.approx_count_distinct("o_custkey").alias("hll_default"),
    ).collect()
    assert rows
    for r in rows:
        # tight-rsd sketch: estimate regime, small relative error
        assert abs(r["hll"] - r["exact"]) <= max(3, 0.02 * r["exact"])
        # default-rsd sketch stays within its advertised error envelope
        assert abs(r["hll_default"] - r["exact"]) <= max(3, 0.1 * r["exact"])


def test_percentile_approx_tracks_exact(spark):
    orders = load_table(spark, SF, "orders")
    row = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(100000)).alias("approx"),
    ).collect()[0]
    # approx returns an actual data value; with accuracy >> n it is the
    # discrete median, within one interpolation step of the exact one
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_suite_entries_registered():
    assert "agg_sketches" in QUERIES
