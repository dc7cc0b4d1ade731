"""Custom stateful streaming operator (applyInPandasWithState):
streaming gap sessionization must emit exactly the sessions the batch
window plan computes on the same bounded input (TopicStream/daemon
state role; Structured Streaming EventTimeTimeout)."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.streaming.stateful import (
    SESSION_SCHEMA,
    sessionize_batch,
    sessionize_stream,
)

GAP = 3600  # 1h


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .where(F.col("user_id") < 16))


def test_batch_sessionization_shape(spark, events):
    sess = sessionize_batch(events, GAP).collect()
    assert sess
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r)
    ev_users = {r["user_id"] for r in events.select("user_id").collect()}
    assert set(by_user) == ev_users
    for rows in by_user.values():
        rows.sort(key=lambda r: r["session_start"])
        for a, b in zip(rows, rows[1:]):
            # sessions are separated by more than the gap and ordered
            gap_s = (b["session_start"] - a["session_end"]).total_seconds()
            assert gap_s > GAP
        for r in rows:
            assert r["session_end"] >= r["session_start"]
            assert r["n_events"] >= 1


def test_streaming_matches_batch(spark, events, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "stream_src")
    os.makedirs(src)

    def _write(df, name):
        pdf = df.toPandas()
        if pdf["ts"].dt.tz is None:
            pdf["ts"] = pdf["ts"].dt.tz_localize("UTC")
        pq.write_table(pa.Table.from_pandas(pdf), os.path.join(src, name),
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)

    _write(events, "f0.parquet")
    # sentinel far-future event for a user outside the filter: advances
    # the watermark past every real session's end + gap, firing the
    # event-time timeouts that close still-open sessions
    mx = events.agg(F.max("ts")).collect()[0][0]
    sentinel = spark.createDataFrame(
        [(999_999, mx, 999_999, "sentinel", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string").withColumn(
            "ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    _write(sentinel, "f1.parquet")

    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double, props string")
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "*.parquet")))
    out = sessionize_stream(stream, GAP, watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sessions_test")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in
           spark.table("sessions_test")
           .where(F.col("user_id") != 999_999)
           .select("user_id", "session_start", "session_end",
                   "n_events", F.round("value_sum", 6).alias("v"))
           .collect()}
    want = {tuple(r) for r in
            sessionize_batch(events, GAP)
            .select("user_id", "session_start", "session_end",
                    "n_events", F.round("value_sum", 6).alias("v"))
            .collect()}
    assert got == want
    assert len(want) > len({u for u, *_ in want})  # multi-session users
    assert [f.name for f in SESSION_SCHEMA.fields] == [
        "user_id", "session_start", "session_end", "n_events", "value_sum"]
