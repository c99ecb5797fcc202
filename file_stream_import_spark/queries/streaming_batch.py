"""Batch-mode registrations of the streaming window operators, oracle-
checked by DuckDB. Spark's window()/session_window() work identically in
batch and streaming plans, so these queries exercise the very same
operator bodies as the streaming tests — the oracle validates the window
math, the streaming tests validate watermarks/late-data behavior."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..streaming.windows import (
    attribution_join,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from . import register


@register(
    "stream_tumbling_hourly",
    oracle="""
    SELECT
      STRFTIME(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (batch form)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), size="1 hour")


@register(
    "stream_sliding_windows",
    oracle="""
    SELECT
      STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type,
      COUNT(*) AS n_events
    FROM (
      SELECT event_type,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
      FROM events
    )
    GROUP BY 1, 2
    """,
)
def stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows every 1 hour: each event lands in exactly
    two windows (oracle: explicit 2-way unnest of window starts)."""
    return sliding_counts(
        load_table(spark, sf_dir, "events"), size="2 hours", slide="1 hour"
    )


@register(
    "stream_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
        CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM ordered
    )
    SELECT user_id,
      STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
      STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window; the
    oracle reproduces [start,end) semantics with gaps-and-islands SQL
    (new session when the gap is >= 30 minutes)."""
    return session_counts(load_table(spark, sf_dir, "events"), gap="30 minutes")


@register(
    "stream_first_event_per_key",
    oracle="""
    SELECT user_id, event_type, event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def stream_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest event per (user, type) — the batch twin of streaming
    first-arrival dedup (dropDuplicates keeps an arbitrary row; this is
    the deterministic event-time version)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        )
    )


@register(
    "stream_stateful_running_totals",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) driven as a REAL
    streaming query: events.parquet feeds a file-source stream, per-user
    running totals update the state store, and the final emissions are
    returned. With the fixture's single drop file this is one micro-batch,
    so the final state equals the batch groupBy — which is the oracle.
    Multi-batch state continuity is exercised in tests/test_streaming.py.
    """
    import os
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from ..streaming.stateful import user_running_totals

    name = f"stateful_totals_{uuid.uuid4().hex[:8]}"
    # subset schema → only these columns are read; ts (TIMESTAMP_NANOS)
    # never enters the plan, so no legacy-nanos handling is needed here
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    q = (
        user_running_totals(src)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tempfile.mkdtemp(), "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # final totals per user: n_events is monotone across emissions, so
    # max_by picks the last state even if the source split into batches
    emitted = spark.table(name)
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )


@register(
    "stream_attribution_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS lag_us,
           ROUND(p.value, 2) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND p.event_type = 'purchase'
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 4 HOUR
    """,
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase interval join (batch form of the stream-stream
    join; the streaming twin with watermark-bounded state is exercised
    in tests/test_streaming.py)."""
    return attribution_join(load_table(spark, sf_dir, "events"))
