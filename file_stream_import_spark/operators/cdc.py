"""Change-data-capture operators: changelog merge and SCD Type 2 history.

The reference's write path is insert-or-update only (ON CONFLICT DO
UPDATE, internal/db/db.go:43-55) — it cannot delete, and it keeps no
history. These two operators complete that lifecycle the way a
warehouse-grade engine does:

* ``apply_changelog`` — upsert + delete in one pass: the LAST operation
  per key (by a total version order) decides the row's fate. This is
  the batch equivalent of a Debezium/Kafka compacted-topic replay.
* ``scd2_history`` — instead of overwriting, every change becomes a
  validity interval (valid_from / valid_to / is_current): the Type-2
  slowly-changing-dimension form.

Plan shape (both): ONE shuffle on the key via a keyed window — the same
single-shuffle merge plan as operators/upsert.py, so AQE skew handling
applies and nothing funnels through a single task. At 100 TB the
changelog is partitioned by key hash; each window partition is one key's
ops, never the whole log.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Replay a changelog to its final state.

    ``changes`` holds one row per operation with an op marker column
    (e.g. 'U' upsert / 'D' delete) and a total order within each key
    given by ``order_cols`` (version number, LSN, event time + unique
    id — MUST be unique per key for determinism). The newest op per key
    wins; keys whose newest op is ``delete_op`` disappear.

    Returns the surviving rows (all original columns) plus ``n_ops``,
    the number of changelog entries folded into each key.
    """
    w = W.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_ops", F.count("*").over(W.partitionBy(*key_cols)).cast("bigint")
        )
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a changelog.

    Each change row becomes one validity interval per key:

    * ``valid_from``  — the row's own ``ts_col``;
    * ``valid_to``    — the NEXT change's ``ts_col`` (open interval;
      null for the newest row);
    * ``is_current``  — true on the newest row per key.

    ``order_cols`` defaults to ``[ts_col]``; pass extra tiebreak columns
    when timestamps can collide (determinism requires a total order).
    """
    order_cols = order_cols or [ts_col]
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    nxt: Column = F.lead(F.col(ts_col)).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", F.col("valid_to").isNull())
    )
