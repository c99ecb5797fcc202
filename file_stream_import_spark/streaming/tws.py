"""Emit-once threshold-crossing alerts — custom stateful streaming.

The reference's only cross-request state is a running ingest counter
(internal/writer/writer.go:52,63-64). streaming/stateful.py generalizes
it to running per-key aggregates; this module adds the EMIT-ONCE shape:
each user accumulates value cents, and the FIRST time the running total
crosses each multiple of the threshold, exactly one alert row
(user, level, total-at-crossing) is emitted — the contract behind
billing alerts ("notify at every $500"), quota warnings, and milestone
events. A plain running aggregate in update mode re-notifies every
batch; the state machine here never re-emits a level.

Two implementations of the same semantics:

* ``threshold_alerts`` — applyInPandasWithState (GroupState), runnable
  everywhere pyspark runs. Append mode: an emitted alert is final.
* ``ThresholdAlerter`` / ``threshold_alerts_tws`` — the same operator on
  Spark 4's transformWithStateInPandas StatefulProcessor, the successor
  API whose named, schema'd state slots (ValueState here; ListState /
  MapState / timers in the same handle) are the forward path for custom
  streaming state. Its Python driver worker imports google.protobuf,
  which this container does not ship, so the entry point fail-fasts with
  the exact remedy (`pip install 'protobuf>=4.25'`) — same policy as the
  Avro reader (io/formats.py): real code, explicit environment gate.
  The two share the state-transition function, so the tested
  applyInPandasWithState path exercises the logic the TWS path runs.

Scale: state is two BIGINTs per user, partitioned across executors by
the group key; emitted rows are bounded by total value growth /
threshold, not event count. State never needs eviction for the alert
semantics (a user's level is monotone), but an idle-TTL can be layered
with GroupStateTimeout without changing the transition function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("level", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cents", T.LongType()),
        T.StructField("level", T.LongType()),
    ]
)


def _advance(
    cents: int, level: int, batch_cents: int, threshold_cents: int
) -> tuple[int, int, pd.DataFrame | None]:
    """Shared state transition: fold a batch's cents into the running
    total and return (new_cents, new_level, alerts-or-None). Crossings
    are defined on the running total, so the whole batch accumulates
    before levels are diffed (intra-batch order is meaningless for a
    sum). The stored level is MONOTONE — a refund batch can lower the
    running total below an already-alerted threshold, and emit-once
    means that level must not re-fire when the total crosses it again."""
    cents += batch_cents
    new_level = max(level, cents // threshold_cents)
    out = None
    if new_level > level:
        out = pd.DataFrame(
            {
                "level": pd.array(
                    range(level + 1, new_level + 1), dtype="int64"
                ),
                "total_cents": pd.array(
                    [cents] * (new_level - level), dtype="int64"
                ),
            }
        )
    return cents, new_level, out


def _batch_cents(pdf: pd.DataFrame) -> int:
    # floor(x*100 + 0.5), NOT pandas .round(): pandas rounds half-to-
    # even while the Spark batch twin rounds half-up — a half-cent value
    # (0.125 * 100 = 12.5 exactly) would otherwise cross a threshold in
    # one path but not the other.
    import numpy as np

    return int(
        np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64").sum()
    )


def threshold_alerts(
    events: DataFrame, threshold_cents: int = 50_000
) -> DataFrame:
    """Streaming emit-once alerts via applyInPandasWithState.

    Input: a streaming DataFrame with (user_id long, value double).
    Append output mode — each alert row is immutable once emitted.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cents, level = state.get if state.exists else (0, 0)
        total = 0
        for pdf in batches:
            total += _batch_cents(pdf)
        cents, level, out = _advance(cents, level, total, threshold_cents)
        state.update((cents, level))
        if out is not None:
            out.insert(0, "user_id", pd.array([key[0]] * len(out), "int64"))
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class ThresholdAlerter(StatefulProcessor):
    """transformWithStateInPandas form: same transition function held in
    a named ValueState slot."""

    def __init__(self, threshold_cents: int) -> None:
        self.threshold_cents = int(threshold_cents)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        cents, level = self._state.get() if self._state.exists() else (0, 0)
        total = 0
        for pdf in rows:
            total += _batch_cents(pdf)
        cents, level, out = _advance(
            cents, level, total, self.threshold_cents
        )
        self._state.update((cents, level))
        if out is not None:
            out.insert(0, "user_id", pd.array([key[0]] * len(out), "int64"))
            yield out

    def close(self) -> None:
        pass


def threshold_alerts_tws(
    events: DataFrame, threshold_cents: int = 50_000
) -> DataFrame:
    """Spark 4 transformWithStateInPandas entry point (requires the
    RocksDB state store provider AND the protobuf package in the Python
    environment — fail-fast with the remedy when absent)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover — env-dependent
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf in the "
            "Python environment (its driver worker speaks protobuf to "
            "the JVM). Install with: pip install 'protobuf>=4.25', and "
            "set spark.sql.streaming.stateStore.providerClass="
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider. The applyInPandasWithState "
            "form (threshold_alerts) runs the same semantics without "
            "either requirement."
        ) from exc
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ThresholdAlerter(threshold_cents),
        outputStructType=ALERT_SCHEMA,
        outputMode="append",
        timeMode="None",
    )


def threshold_alerts_batch(
    events: DataFrame, threshold_cents: int = 50_000
) -> DataFrame:
    """Batch twin: the set of (user, level) crossings implied by each
    user's final total — what the stream must have emitted exactly once
    after all batches. total_cents is the final total (the stream
    reports the total AT crossing time, which depends on batch
    boundaries, so parity tests compare (user_id, level) sets and the
    terminal totals separately). Parity additionally assumes totals are
    non-decreasing: after a refund the stream retains levels it already
    emitted (monotone state) while this twin only sees the final total —
    the stream is authoritative there by design."""
    totals = (
        events.groupBy("user_id")
        .agg(
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("cents")
        )
        .withColumn(
            # integer DIV, not double /: exact for totals beyond 2^53
            # cents, symmetric with _advance's Python floor-division
            "max_level",
            F.expr(f"cents DIV {int(threshold_cents)}"),
        )
        # sequence(1, 0) would generate DESCENDING [1, 0]; users below
        # the first threshold must drop out before the explode.
        .filter(F.col("max_level") >= 1)
    )
    return totals.select(
        "user_id",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.col("max_level"))
        ).alias("level"),
        F.col("cents").alias("total_cents"),
    )
