"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the fixture tables registered as views (mirroring the driver's oracle
harness), and a comparison helper that reproduces the driver's
columns-sorted-by-name, order-insensitive value comparison."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from file_stream_import_spark.io.tables import TABLE_NAMES
from file_stream_import_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm_cell(v) -> str:
    """Canonical string form of a cell so Spark and DuckDB results compare.

    Floats are formatted at 1e-6 absolute precision: queries already
    quantize with ROUND() on both sides, so this only absorbs dtype
    conversion noise (e.g. float32 vs float64 in pandas).
    """
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return f"{v:.6f}"
    # numpy scalars → python
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return str(v)
    return str(v)


def normalize_pdf(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def assert_frames_match(spark_df, duck_rel, name: str = "query") -> None:
    spdf = spark_df.toPandas()
    ddf = duck_rel.df()
    assert sorted(spdf.columns) == sorted(ddf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} "
        f"duck={sorted(ddf.columns)}"
    )
    assert len(spdf) == len(ddf), (
        f"{name}: row count mismatch spark={len(spdf)} duck={len(ddf)}"
    )
    srows = normalize_pdf(spdf)
    drows = normalize_pdf(ddf)
    if srows != drows:
        diff_s = [r for r in srows if r not in set(drows)][:5]
        diff_d = [r for r in drows if r not in set(srows)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n  spark-only sample: {diff_s}\n"
            f"  duck-only sample: {diff_d}\n  cols={sorted(spdf.columns)}"
        )
