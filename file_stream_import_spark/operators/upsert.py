"""Keyed last-writer-wins upsert — the reference's ON CONFLICT semantics
as a pure DataFrame transform.

Reference behavior being reproduced (internal/db/db.go:43-80):
  * ``INSERT ... ON CONFLICT (locid) DO UPDATE SET ...EXCLUDED...`` —
    re-importing an existing key replaces every payload column
    (db.go:63-72).
  * The surrogate ``id`` is generated at first insert
    (``gen_random_uuid()``, db.go:85) and NEVER changes on update (the
    DO UPDATE list omits id, db.go:67-71).
  * Within one batch, later rows win (the reference would actually error
    on intra-batch duplicates — "cannot affect row a second time" — so we
    implement the semantics it gets by accident via unique generated ids:
    dedup-first, last wins).

Scale design: a single hash shuffle on the key (union → window), no join.
At 100 TB the existing side never re-sorts globally; AQE skew-join
handling applies if a key is hot. For true incremental ingestion against
a live Postgres, use io.jdbc.upsert_postgres which pushes ON CONFLICT to
the database per-partition instead of shuffling the full table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame | None,
    incoming: DataFrame,
    key: str = "locid",
    id_col: str = "id",
    arrival_col: str | None = None,
) -> DataFrame:
    """Merge ``incoming`` into ``existing`` with last-writer-wins per key.

    Payload columns are everything except ``key`` and ``id_col``.
    ``arrival_col``: optional strictly-increasing column defining "later"
    within the incoming batch; defaults to file order via
    ``monotonically_increasing_id`` (partition index is ordered by file
    split offset for file sources, so this is input order for CSV/parquet).

    Returns a DataFrame with the same schema as ``existing``
    (id, key, payload...): updated rows keep their original id; new rows
    get ``uuid()``.
    """
    payload_cols = [c for c in incoming.columns if c not in (key, id_col, arrival_col)]

    if arrival_col is None:
        arrival_col = "__arrival"
        incoming = incoming.withColumn(arrival_col, F.monotonically_increasing_id())

    inc = incoming.select(
        F.lit(None).cast("string").alias(id_col),
        F.col(key),
        *[F.col(c) for c in payload_cols],
        F.col(arrival_col).cast("long").alias("__arr"),
    )
    if existing is None:
        u = inc
    else:
        ex = existing.select(
            F.col(id_col),
            F.col(key),
            *[F.col(c) for c in payload_cols],
            F.lit(-1).cast("long").alias("__arr"),
        )
        u = ex.unionByName(inc)

    # One shuffle: rank arrivals and recover the pre-existing id in the
    # same window partition.
    w = W.partitionBy(key)
    ranked = u.withColumn(
        "__rn", F.row_number().over(w.orderBy(F.col("__arr").desc()))
    ).withColumn("__kept_id", F.max(id_col).over(w))
    return (
        ranked.filter(F.col("__rn") == 1)
        .withColumn(id_col, F.coalesce(F.col("__kept_id"), F.expr("uuid()")))
        .select(id_col, key, *payload_cols)
    )
