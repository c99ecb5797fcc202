"""Time-series regularization: resample events onto a fixed-step grid per
key, filling gap buckets with zero counts and carrying the last observed
aggregate forward (the hypertable "gap-fill + locf" shape; TimescaleDB
calls this time_bucket_gapfill + locf).

The reference has no time-series surface (its only time column is the
CSV arrival order); this is north-star functionality for the events
table (TESTDATA.md), built entirely from Catalyst primitives:

  1. bucket aggregate — one shuffle on (key, bucket), partial-agg'd;
  2. per-key bounds   — tiny frame (one row per key);
  3. spine            — sequence()+explode generates the dense grid
                        executor-side: no driver loop, no UDF;
  4. left join + locf — last(ignorenulls) over (key ORDER BY bucket),
                        one shuffle on key.

Scale: the spine is |keys| x (span/step) rows — generated, never
shuffled full-width (the join carries only grid keys + bucket). A key
whose span/step blows past partition memory (years at 1-second steps)
needs the grid split by coarser chunks first; at the fixture's
hour-granularity this is nowhere near a concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Dense per-key time grid at ``unit`` granularity: event counts with
    0 for gap buckets, and the last non-gap bucket's value sum carried
    forward (locf). Grid spans each key's own [min, max] bucket range.
    """
    bucketed = (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
    )
    bounds = bucketed.groupBy(key_col).agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    spine = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr(f"INTERVAL 1 {unit}"))
        ).alias("bucket"),
    )
    joined = spine.join(bucketed, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        F.col(key_col),
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ffill"),
    )
