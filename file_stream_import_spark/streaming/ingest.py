"""Continuous CSV ingestion with upsert state — the reference's flagship
loop (HTTP CSV push → chunk → worker pool → ON CONFLICT upsert,
internal/writer/writer.go:40-129 + internal/db/db.go:43-80) restated as
Structured Streaming.

Topology mapping:
  * HTTP POST /process (writer.go:35-38)  → drop directory watched by a
    file-source stream (push becomes pull; the proxy in
    cmd/writer/main.go:48-80 is replaced by "write the file to the dir");
  * 12k-row chunks × 10 workers (writer.go:19-20) → micro-batches ×
    executor parallelism;
  * per-chunk ON CONFLICT commit (db.go:74) → per-micro-batch
    merge_upsert into an immutable versioned parquet snapshot.

State versioning: each micro-batch writes state to ``v{batch_id}`` and
readers pick the highest complete version (a _SUCCESS-marked dir). This
mirrors the reference's at-least-once, non-atomic ingest (SURVEY.md
§3.1.6) but upgrades it: a mid-stream failure leaves the LAST COMPLETE
snapshot readable instead of a half-committed table, and re-running a
batch is idempotent because merge_upsert is.

Scale: the merge shuffles state+batch on the key per micro-batch —
O(|state|) per batch, fine for dimension-sized tables (the reference's
locations table); for fact-sized state use io.jdbc.upsert_postgres or a
key-partitioned state layout so only touched partitions rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..io.csv_ingest import ingest_locations_stream
from ..operators.upsert import merge_upsert


def _version_dirs(state_root: str) -> list[str]:
    if not os.path.isdir(state_root):
        return []
    out = []
    for d in sorted(os.listdir(state_root)):
        full = os.path.join(state_root, d)
        if d.startswith("v") and os.path.exists(os.path.join(full, "_SUCCESS")):
            out.append(full)
    return out


def latest_state(spark: SparkSession, state_root: str) -> DataFrame | None:
    """Highest complete (_SUCCESS-marked) state snapshot, or None."""
    versions = _version_dirs(state_root)
    return spark.read.parquet(versions[-1]) if versions else None


def stream_csv_upsert(
    spark: SparkSession,
    drop_dir: str,
    state_root: str,
    checkpoint_dir: str,
    key: str = "locid",
):
    """Start the continuous ingest: watch ``drop_dir`` for CSV files,
    merge each micro-batch into the keyed state with last-writer-wins.

    Returns the StreamingQuery; state snapshots appear under
    ``state_root`` and ``latest_state`` reads the current table.
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        current = latest_state(spark, state_root)
        merged = merge_upsert(current, batch_df, key=key)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"v{batch_id:09d}")
        )

    return (
        ingest_locations_stream(spark, drop_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
