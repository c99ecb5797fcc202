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
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def finalized_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Emit each user session exactly ONCE, when the watermark proves it
    can no longer change — the contract F.session_window cannot express
    (update mode re-emits on every change and never says "final"; append
    mode only emits windowed AGGREGATES, not an arbitrary state-machine
    payload).

    Events BUFFER in per-user state until the watermark passes
    session_end + gap; only then is the session sessionized-and-emitted.
    Buffering (rather than folding eagerly into an open session) is what
    makes the stream output EQUAL batch sessionization under
    out-of-order arrival: a late event still above the watermark can
    extend a session backward or split in between — decisions that are
    only safe to freeze once the watermark passes, because every future
    event is at-or-after the watermark by the late-row filter. Idle
    users flush by EventTimeTimeout without waiting for their next
    event.

    Scale: state per user is the events of the open horizon only
    (bounded by watermark delay + gap, not stream length), shuffled on
    user_id across the state store; each micro-batch touches only keys
    with new data or expired timers. The batch twin is sessionize_events
    (queries/analytics.py) — stream-final output equals the batch
    sessionization of the same data once the watermark passes it
    (asserted, including an out-of-order arrival, in
    tests/test_streaming.py).
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
        if state.exists:
            ts_buf, val_buf = (list(x) for x in state.get)
        else:
            ts_buf, val_buf = [], []
        if not state.hasTimedOut:
            for pdf in batches:
                us = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
                )
                ts_buf.extend(us.tolist())
                val_buf.extend(float(v) for v in pdf["value"])
        wm_us = state.getCurrentWatermarkMs() * 1000

        order = sorted(range(len(ts_buf)), key=lambda i: ts_buf[i])
        sessions: list[list[int]] = []  # index runs into `order`
        for pos, i in enumerate(order):
            if pos and ts_buf[i] - ts_buf[order[pos - 1]] <= gap_us:
                sessions[-1].append(i)
            else:
                sessions.append([i])

        done: list[tuple[int, int, int, float]] = []
        keep: list[int] = []
        open_ends: list[int] = []
        for idxs in sessions:
            end = ts_buf[idxs[-1]]
            if end + gap_us < wm_us:
                done.append(
                    (
                        ts_buf[idxs[0]],
                        end,
                        len(idxs),
                        sum(val_buf[i] for i in idxs),
                    )
                )
            else:
                keep.extend(idxs)
                open_ends.append(end)

        if keep:
            state.update(
                ([ts_buf[i] for i in keep], [val_buf[i] for i in keep])
            )
            # earliest instant any open session becomes final; keep the
            # timer strictly ahead of the current watermark as required
            fire_ms = min(open_ends) // 1000 + gap_us // 1000 + 1
            state.setTimeoutTimestamp(
                max(fire_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        yield pd.DataFrame(
            {
                "user_id": pd.Series([key[0]] * len(done), dtype="int64"),
                "session_start": pd.to_datetime(
                    [s for s, _, _, _ in done], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [e for _, e, _, _ in done], unit="us"
                ),
                "n_events": pd.Series(
                    [c for _, _, c, _ in done], dtype="int64"
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
