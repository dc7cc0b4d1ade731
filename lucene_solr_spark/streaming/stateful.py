"""Custom stateful streaming operators (applyInPandasWithState).

Solr's streaming-expression daemons keep per-key state across a
stream (e.g. the `topic()` stream's checkpointed cursor, Solr
TopicStream; the rollup/daemon combination aggregating forever) —
the Structured Streaming rendering of "custom stateful operator" is
``applyInPandasWithState`` with a GroupState per key and event-time
timeouts.

The shipped operator is **gap sessionization** over the events table
(`user_id, ts, event_type, value`): events of one user separated by
less than ``gap`` belong to one session; a session closes when the
watermark passes its last event + gap. This is the canonical
stateful op a 100-TB training-data pipeline needs (bot filtering,
engagement aggregation, per-session sampling) and the exact shape of
Spark's structured-sessionization pattern — state is per-user-id
(hash-partitioned by the state store, no shuffle beyond the groupBy),
so it scales horizontally with executors.

``sessionize_batch`` is the batch twin (lag/cumsum window
sessionization) used as the oracle: on a bounded input the streaming
operator must emit exactly the sessions the batch plan computes —
that identity is the pytest gate (`test_stateful_streaming`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["SESSION_SCHEMA", "sessionize_batch", "sessionize_stream"]

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
])

#: state carried per user: open-session accumulator
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n", LongType()),
    StructField("vsum", DoubleType()),
])


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch gap sessionization: a new session starts where the gap to
    the user's previous event is > ``gap_seconds``; session id is the
    running count of such breaks (lag + cumulative sum — two window
    passes over one user_id shuffle, no UDF)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events parquet loads ts as TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP (session tz is UTC, so the cast is the identity map)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = (F.when(
        us - F.lag(us).over(w) > F.lit(int(gap_seconds) * 1_000_000),
        F.lit(1)).otherwise(F.lit(0)))
    with_sid = (events
                .withColumn("_brk", brk)
                .withColumn("_sid", F.sum("_brk").over(
                    w.rowsBetween(Window.unboundedPreceding, 0))))
    return (with_sid.groupBy("user_id", "_sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("value_sum"))
            .drop("_sid"))


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "0 seconds") -> DataFrame:
    """Streaming gap sessionization over ``readStream`` events.

    ``applyInPandasWithState`` keyed by user_id; the GroupState holds
    the open session. An incoming micro-batch's events extend or
    break the open session; sessions broken by a later event are
    emitted immediately, and the still-open session is emitted when
    the event-time timeout fires (watermark passed last event + gap)
    — so on a bounded input, after the final empty batch advances the
    watermark to +inf, emitted sessions == the batch plan's output.
    """
    import pandas as pd

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            start_us, end_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n], "value_sum": [vsum]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        # normalize whatever datetime64 unit Arrow handed us to micros
        ts_us = pd.Series(
            rows["ts"].values.astype("datetime64[us]").astype("int64"))
        vals = rows["value"].fillna(0.0)
        if state.exists:
            start_us, end_us, n, vsum = state.get
        else:
            start_us = end_us = None
            n, vsum = 0, 0.0
        out = []
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if start_us is None:
                start_us, end_us, n, vsum = t, t, 1, float(v)
            elif t - end_us > gap_us:
                out.append((start_us, end_us, n, vsum))
                start_us, end_us, n, vsum = t, t, 1, float(v)
            else:
                end_us = max(end_us, t)
                n += 1
                vsum += float(v)
        state.update((start_us, end_us, n, vsum))
        # close the open session when the watermark passes end + gap
        # (clamped above the current watermark — Spark rejects timeout
        # timestamps at/before it, e.g. for a user whose events are old
        # relative to the stream's max event time)
        timeout_ms = (end_us + gap_us) // 1000 + 1
        try:
            wm = state.getCurrentWatermarkMs()
        except Exception:
            wm = 0
        state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        if out:
            yield pd.DataFrame({
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us")
                                  for s, _e, _n, _v in out],
                "session_end": [pd.Timestamp(e, unit="us")
                                for _s, e, _n, _v in out],
                "n_events": [n_ for _s, _e, n_, _v in out],
                "value_sum": [v_ for _s, _e, _n, v_ in out]})

    return (events
            # watermarks require TIMESTAMP (not NTZ); UTC session tz
            # makes the cast an identity map
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="EventTimeTimeout"))
