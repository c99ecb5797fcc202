"""Streaming top-k leaderboard via foreachBatch — the standard pattern
for rank-in-streaming.

A global (or per-window) rank is NOT expressible inside an append-mode
streaming plan: ranking needs to see every group's current count, which
only exists in aggregation state. The production pattern is therefore
two-layer:

  1. the STREAM maintains windowed counts (watermarked tumbling windows
     in update mode — incremental, state bounded by watermark eviction);
  2. foreachBatch receives each micro-batch's UPDATED (window, key)
     counts as a plain batch DataFrame, merges them into a compact
     result store keyed on (window, key) — counts are cumulative per
     key, so last-write-wins per (window, key) — and re-ranks the
     affected windows with an ordinary rank window.

The merge store stays |windows|x|keys| — dimension-sized, never
stream-sized; re-ranking it is a batch window over that small frame.
This mirrors how Kafka->Spark->serving leaderboards are actually built
(state in the stream, rank at the sink).

Reference tie-in: the reference has no event-time semantics at all
(internal/writer/writer.go streams bytes, not events); this is a
north-star addition layered on the same tumbling_counts operator the
oracle checks in batch form (queries/streaming_batch.py).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .windows import read_events_stream

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _duration_seconds(spec: str) -> int:
    """Parse a Spark duration literal like '2 hours' to seconds."""
    n, unit = spec.split()
    return int(n) * _UNIT_SECONDS[unit]


def trending_stream(
    spark: SparkSession,
    drop_dir: str,
    checkpoint_dir: str,
    store: dict,
    k: int = 3,
    size: str = "1 hour",
    watermark: str = "2 hours",
):
    """Start the two-layer trending pipeline; returns the StreamingQuery.

    ``store`` is a plain dict standing in for the serving store
    (Redis/RDBMS in production): ``store['counts']`` maps
    window_start -> {event_type: count} for LIVE windows only,
    ``store['top']`` holds {window_start: [(event_type, n), ...]} for
    live windows. Per batch, the merge is proportional to the
    micro-batch's updated keys: only windows TOUCHED by the batch are
    re-ranked, and windows that have passed the stream's own watermark
    horizon (their state is already evicted upstream, so update mode
    can never emit them again) are FLUSHED: their final ranking is
    handed to ``store['flush']`` (a callable ``(window_start, ranking)``
    — the serving-sink write; defaults to recording into
    ``store['flushed']``) and then deleted from BOTH dicts. Every
    driver-side dict therefore plateaus at (watermark + window)/window
    live windows x |keys| regardless of stream lifetime — on a
    months-long stream nothing in the driver grows.
    """
    wm_secs = _duration_seconds(watermark)
    size_secs = _duration_seconds(size)
    events = read_events_stream(spark, drop_dir)
    counts = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # updated (window, key) counts only — cumulative, so overwrite.
        # .collect() here is the compact update-mode delta, not the stream.
        counts = store.setdefault("counts", {})
        top = store.setdefault("top", {})
        touched: set[str] = set()
        for r in batch_df.collect():
            counts.setdefault(r["window_start"], {})[r["event_type"]] = r["n"]
            touched.add(r["window_start"])
        # re-rank ONLY the windows this batch touched — O(batch keys)
        for ws in touched:
            top[ws] = sorted(
                counts[ws].items(), key=lambda t: (-t[1], t[0])
            )[:k]
        # evict windows past the watermark horizon: the stream's own
        # state for them is gone, so update mode can never emit them
        # again — mirror that eviction so the mutable store is bounded,
        # and FLUSH each closed window's final ranking to the serving
        # sink before dropping it (in production: the DB upsert).
        if counts:
            high = max(counts)
            horizon = (
                _dt.datetime.strptime(high, "%Y-%m-%d %H:%M:%S")
                - _dt.timedelta(seconds=wm_secs + size_secs)
            ).strftime("%Y-%m-%d %H:%M:%S")
            flush = store.get("flush") or (
                lambda ws, ranking: store.setdefault("flushed", {})
                .__setitem__(ws, ranking)
            )
            for ws in [w for w in counts if w < horizon]:
                del counts[ws]
            for ws in [w for w in top if w < horizon]:
                flush(ws, top[ws])
                del top[ws]

    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_batch)
        .start()
    )


def rank_counts(counts: DataFrame, k: int = 3) -> DataFrame:
    """The batch re-rank layer as a DataFrame op (what a SQL serving
    store would run): top-k per window with the deterministic
    (n DESC, key ASC) order — identical to trending_hourly_topk's
    ranking (queries/round4.py), so the stream+store composition and
    the oracle-checked batch query agree."""
    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
