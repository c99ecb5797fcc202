"""Regression: TIMESTAMP_NTZ parquet reads (ADVICE round 3).

The driver environment reads the fixture parquet with
spark.sql.parquet.inferTimestampNTZ / spark.sql.timestampType such that
events.ts surfaces as TIMESTAMP_NTZ, on which TIMESTAMP-only functions
(unix_micros) raise DATATYPE_MISMATCH — in round 3 this silently removed
oracle coverage for sessionize_events / merge_intervals /
asof_next_purchase / stream_attribution_join. load_table now normalizes
every NTZ column to TIMESTAMP_LTZ (identity on the stored microseconds
under the harness's UTC session), so those queries analyze and return
identical values regardless of the session's timestamp-type config.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from file_stream_import_spark.io.tables import load_table

NTZ_CONFS = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.timestampType": "TIMESTAMP_NTZ",
}

AFFECTED = [
    "sessionize_events",
    "merge_intervals",
    "asof_next_purchase",
    "stream_attribution_join",
    # round-4 queries that also apply unix_micros to events.ts
    "trailing_hour_window",
    "time_weighted_avg",
    "max_concurrent_sessions",
    "pit_status_lookup",
]


@pytest.fixture()
def ntz_session(spark):
    """Flip the session into the driver's NTZ configuration and restore."""
    old = {k: spark.conf.get(k, None) for k in NTZ_CONFS}
    for k, v in NTZ_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_load_table_normalizes_ntz(ntz_session, sf_dir):
    raw = ntz_session.read.parquet(f"{sf_dir}/events.parquet")
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz", (
        "precondition: this config must reproduce the driver's NTZ read"
    )
    df = load_table(ntz_session, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_ntz_cast_preserves_micros(ntz_session, sf_dir):
    """Under a UTC session the NTZ→LTZ cast is an identity on the stored
    microseconds: wall-clock strings match the raw NTZ values row-by-row."""
    raw = ntz_session.read.parquet(f"{sf_dir}/events.parquet")
    ltz = load_table(ntz_session, sf_dir, "events")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    a = [
        r[0]
        for r in raw.select(F.date_format("ts", fmt)).orderBy("event_id").collect()
    ]
    b = [
        r[0]
        for r in ltz.select(F.date_format("ts", fmt)).orderBy("event_id").collect()
    ]
    assert a == b


@pytest.mark.parametrize("name", AFFECTED)
def test_affected_queries_run_under_ntz(ntz_session, sf_dir, name):
    from file_stream_import_spark.queries import all_queries

    out = all_queries()[name](ntz_session, sf_dir)
    assert "timestamp_ntz" not in [t for _, t in out.dtypes]
    assert out.count() > 0
