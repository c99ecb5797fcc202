"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps exactly one piece of cross-request state — a running
ingest row-counter (atomic uint32, internal/writer/writer.go:52,63-64).
This generalizes it to per-key running aggregates maintained in the state
store across micro-batches: each batch updates (n_events, sum_value) per
user and emits the refreshed totals.

Scale: state is partitioned by the group key across executors (the state
store shuffles on user_id); per-key state is O(1) (two numbers), so total
state is bounded by |users|, not stream length. GroupStateTimeout can
evict idle keys; NoTimeout here because the row-counter semantics are
"forever running", like the reference's counter.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, sum_value) maintained across
    micro-batches; emits one refreshed row per user per batch in which
    that user appeared. Streaming input required; the batch twin is a
    plain groupBy (same output after the final batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def finalized_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit each user session exactly ONCE, when it closes — either a
    later event arrives beyond the inactivity gap (closed by data) or
    the watermark passes session_end + gap (closed by EventTimeTimeout,
    so the last session of an idle user still flushes without waiting
    for that user to return).

    This is the custom-stateful shape F.session_window cannot express:
    session_window in update mode re-emits a session on every change and
    never signals "final"; the append-mode variant only emits windowed
    AGGREGATES, while here the state machine owns an arbitrary payload
    and the emit-on-close contract downstream sinks (e.g. a billing
    pipeline charging per completed session) need.

    Scale: state is one 4-field row per ACTIVE user (the state store
    shuffles on user_id), timeouts evict idle keys, and each micro-batch
    touches only keys with new data or expired timers. The batch twin is
    sessionize_events (queries/analytics.py) — stream-final output must
    equal the batch sessionization of the same data once the watermark
    passes everything (asserted in tests/test_streaming.py).
    """
    n, unit = gap.split()
    gap_us = int(n) * {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
    }[unit]

    def update(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        done: list[tuple[int, int, int, float]] = []
        if state.hasTimedOut:
            done.append(tuple(state.get))
            state.remove()
        else:
            rows: list[tuple[int, float]] = []
            for pdf in batches:
                us = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                )
                rows.extend(zip(us.tolist(), pdf["value"].tolist()))
            rows.sort()
            cur = list(state.get) if state.exists else None
            for ts, v in rows:
                if cur is not None and ts - cur[1] > gap_us:
                    done.append(tuple(cur))
                    cur = None
                if cur is None:
                    cur = [ts, ts, 0, 0.0]
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += float(v)
            if cur is not None:
                state.update(tuple(cur))
                # fire when the watermark passes end + gap; the +1 guard
                # keeps the timestamp strictly ahead of the current
                # watermark as the API requires
                fire_ms = cur[1] // 1000 + gap_us // 1000
                state.setTimeoutTimestamp(
                    max(fire_ms, state.getCurrentWatermarkMs() + 1)
                )
        yield pd.DataFrame(
            {
                "user_id": pd.Series(
                    [key[0]] * len(done), dtype="int64"
                ),
                "session_start": pd.to_datetime(
                    [s for s, _, _, _ in done], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [e for _, e, _, _ in done], unit="us"
                ),
                "n_events": pd.Series(
                    [n for _, _, n, _ in done], dtype="int64"
                ),
                "sum_value": [round(t, 2) for _, _, _, t in done],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
