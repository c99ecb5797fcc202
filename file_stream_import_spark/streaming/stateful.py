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
