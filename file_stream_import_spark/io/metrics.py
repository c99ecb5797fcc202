"""Ingest metrics via Observation — the reference's running row counter
(atomic uint32 incremented per batch, internal/writer/writer.go:52,63-64)
without a second pass over the data.

``df.observe`` attaches aggregates that are computed AS A SIDE EFFECT of
whatever action executes the plan — the 100 TB-safe replacement for
calling ``df.count()`` next to the real job (which would scan twice).
Streaming twin: ``observe`` metrics surface in each progress event
(query.lastProgress["observedMetrics"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_ingest_metrics(
    df: DataFrame, name: str = "ingest"
) -> tuple[DataFrame, Observation]:
    """Attach row/byte-ish counters to a plan.

    Returns (df, observation); after ANY action on the returned df,
    ``observation.get`` holds {n_rows, n_key_nulls} — the reference's
    running count plus the data-quality check it never had.
    """
    obs = Observation(name)
    first_col = df.columns[0]
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(first_col).isNull(), 1).otherwise(0)
        ).alias("n_key_nulls"),
    )
    return observed, obs
