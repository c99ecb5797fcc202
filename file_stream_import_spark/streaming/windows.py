"""Structured Streaming operators over the events stream: tumbling /
sliding / session windows with watermarks, and watermark-bounded dedup.

The reference's "streaming" is byte-stream I/O (bufio over an HTTP body,
internal/writer/writer.go:47-48) with no event-time semantics; these are
north-star additions. Batch-equivalent forms (same window math on the
same data) are registered for the DuckDB oracle in
queries/streaming_batch.py — Spark's window/session_window functions are
usable in both batch and streaming plans, so the SAME operator body is
exercised by the oracle and by the streaming tests.

Scale: watermarks bound state (late rows beyond the delay are dropped,
state for closed windows is evicted); groupBy(window, key) shuffles on
(window, key) — at 100 TB the key cardinality, not the stream length,
sizes the state store. Session windows merge per key; skewed users are
the hazard → cap sessions with the watermark delay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of events (parquet drops with µs timestamps).
    maxFilesPerTrigger gives deterministic micro-batch boundaries in tests
    and backpressure in production."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(drop_dir)
    )


def tumbling_counts(
    events: DataFrame, size: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows per event_type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    size: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in size/slide windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", size, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events arrive within ``gap`` (an event exactly ``gap`` after the
    previous one starts a NEW session — [start, end) semantics)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermark-bounded exact dedup on event_id: duplicates arriving
    within the watermark delay are dropped; state is evicted after it.
    (Streaming only — batch twin is dropDuplicates.)"""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
):
    """Drive a streaming query to completion synchronously against a
    memory sink (test harness; production uses foreachBatch/parquet)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    return q


def attribution_join(
    events: DataFrame,
    within: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every purchase a user makes within
    ``within`` after one of their clicks (click→purchase attribution).

    Streaming semantics: both sides carry watermarks and the join
    condition bounds purchase time to (click_ts, click_ts + within], so
    Spark can evict click state once the purchase-side watermark passes
    click_ts + within — state is bounded by the interval, not the stream
    length. Works identically on a batch frame (no watermarks needed).

    Scale: the join shuffles both sides on user_id; the time bound keeps
    per-key state small even for hot users. Output order is undefined
    (streaming append) — consumers sort or aggregate downstream.

    The watermark is applied to ``ts`` BEFORE the event-type filters:
    with per-side watermarks (filter-then-watermark) a side whose event
    type goes idle never advances its watermark, the global minimum
    stalls, and join state grows without bound — a click OR a purchase
    must move both sides' clocks. Verified by the state-metric
    assertions in tests/test_streaming.py::TestStateCleanup.

    Known residual hazard (measured, r5; pinned in
    tests/test_streaming.py::TestWatermarkPushdownPin): watermark-
    before-filter does NOT protect against event types outside
    {click, purchase} — Catalyst pushes each side's deterministic type
    predicate all the way into the file SOURCE, so e.g. a views-only
    stretch of traffic is read as 0 rows, reaches no watermark
    operator, and eviction stalls until the next click or purchase
    arrives. If the feed can go click/purchase-silent for long
    periods, pre-split the topic (or ingest a heartbeat of a joined
    type); there is no DataFrame-level optimizer barrier to pin the
    filter above the watermark.
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))).alias(
            "lag_us"
        ),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def attribution_join_outer(
    events: DataFrame,
    within: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, attributed
    to a purchase when one follows within ``within`` — and emitted with
    NULL purchase columns otherwise. The outer side is the semantics
    inner attribution_join cannot give: "which clicks did NOT convert"
    is the campaign-health question.

    Streaming mechanics worth knowing: the null-extended row for an
    unmatched click is NOT emitted when the click arrives — Spark must
    first be SURE no matching purchase can still come, which is only
    true once the purchase-side watermark passes click_ts + within. So
    unmatched results trail the data by the watermark delay, and (the
    subtle part) the state eviction that triggers them runs lazily at
    the start of a LATER micro-batch — both behaviors pinned in
    tests/test_streaming.py. State stays bounded exactly as in the
    inner form (same condition, same eviction clock); batch frames get
    ordinary left-outer semantics with no delay.
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "left_outer").select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
        (F.col("purchase_id").isNotNull()).alias("converted"),
    )


def attribution_join_full_outer(
    events: DataFrame,
    within: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """FULL OUTER stream-stream interval join: one row per click AND
    per purchase — matched pairs, unconverted clicks (NULL purchase
    side), and ORPHAN purchases with no attributable click in the
    preceding ``within`` (NULL click side). The orphan-purchase side is
    what left-outer attribution cannot see: conversions arriving with
    no tracked touchpoint — the attribution-gap / broken-tracking /
    fraud signal.

    This also subsumes the RIGHT OUTER form (project the purchase-side
    rows): Spark supports rightOuter stream-stream joins, but the full
    outer costs the same state (both sides are already retained to
    answer the inner match) and yields both unmatched sets in one
    query, so it is the variant worth running.

    Same mechanics as attribution_join_outer: null-extended rows for
    EITHER side are emitted only once the opposite side's watermark
    proves no match can still arrive, so unmatched results trail the
    stream by the watermark delay and surface on a later micro-batch's
    state eviction. State is bounded by the same interval + watermark
    clock on both sides; batch frames get ordinary full-outer semantics
    immediately.
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "full_outer").select(
        "click_id",
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "purchase_id",
        F.round("purchase_value", 2).alias("purchase_value"),
        F.when(
            F.col("click_id").isNull(), F.lit("purchase_only")
        )
        .when(F.col("purchase_id").isNull(), F.lit("click_only"))
        .otherwise(F.lit("matched"))
        .alias("status"),
    )


def attribution_join_semi(
    events: DataFrame,
    within: str = "4 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT SEMI stream-stream interval join: each click emitted AT MOST
    ONCE if any purchase follows within ``within`` — the existence check
    ("did this click convert at all?"). Unlike the inner join, a click
    with three matching purchases produces ONE row, so downstream
    conversion counts need no dedup; unlike the outer join, nothing
    waits for the watermark — the row emits as soon as the FIRST match
    arrives.

    Completes the stream-stream join matrix (inner / left outer / full
    outer / semi); the anti form ("clicks that did NOT convert") is the
    click_only projection of attribution_join_full_outer, since
    streaming must prove the negative via the watermark anyway. State
    is bounded by the same interval + watermark clock.
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return clicks.join(purchases, cond, "left_semi").select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
    )


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static dimension enrichment: join the (unbounded) event
    stream against a bounded dimension table.

    Spark plans a stream-static equi-join with the STATIC side as the
    build side — broadcast when small — re-resolved per micro-batch, so
    a dimension refresh (new parquet snapshot) is picked up without
    restarting the query, and NO state store is involved (unlike
    stream-stream joins there is nothing to buffer: each micro-batch is
    a plain batch join). This is the streaming mirror of the batch
    dimension joins (q5's star shape) and the standard "attach user /
    catalog attributes at ingest" operator; at 100 TB the stream side
    never shuffles for the join when the dimension broadcasts.

    ``dim_cols`` prunes the dimension projection before the join so the
    broadcast carries only what's needed.
    """
    d = dim.select(on, *dim_cols) if dim_cols else dim
    return events.join(F.broadcast(d), on, "left")
