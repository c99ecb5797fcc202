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

# ---------------------------------------------------------------------------
# Slow-tier marking (r17). pytest.ini's default `-m "not slow"` excludes
# these from the driver-verified tier; run them with `-m slow` (or the
# whole suite with `-m ""`). Selection = the fuzz / random-history
# convergence / soak / large-fixture suites from the measured 46-min
# full run (durations log, 2026-08-18): whole files where the entire
# file is that shape, single classes otherwise — every subsystem keeps
# fast smoke/contract tests in the default tier, and all r16/r17
# optimization pins stay fast.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    # property/fuzz harnesses (random histories vs models)
    "test_properties.py",
    "test_model_fuzz.py",
    "test_concurrency_fuzz.py",
    # full declared-query-vs-DuckDB sweep at sf0.001 — the round driver
    # independently runs the same comparison at sf0.01 (CORRECTNESS),
    # so the default tier doesn't pay the ~5 min duplicate
    "test_oracle.py",
    # large-fixture scaling suites
    "test_metadata_scale.py",
    "test_bloom_distributed.py",
    # replication convergence fuzz + long changefeed soaks
    "test_cdf_replication.py",
}

_SLOW_CLASSES = {
    ("test_streaming.py", "TestOuterAttributionJoin"),
    ("test_streaming.py", "TestChangefeedAdmissionControl"),
    ("test_streaming.py", "TestFinalizedSessions"),
    ("test_streaming.py", "TestFinalizedSessionsStateBound"),
    ("test_streaming.py", "TestStateCleanup"),
    ("test_streaming.py", "TestTrendingForeachBatch"),
    ("test_incremental_mv.py", "TestRefreshJoinMv"),
    ("test_incremental_mv.py", "TestPercentileHistograms"),
    ("test_incremental_mv.py", "TestRefreshMvDistinct"),
    ("test_incremental_mv.py", "TestRefreshMvMinMax"),
    ("test_incremental_mv.py", "TestStreamingMaintainerParity"),
    ("test_incremental_mv.py", "TestStreamingMvMaintainer"),
    ("test_incremental_mv.py", "TestMvConvergenceFuzz"),
    ("test_incremental_mv.py", "TestFloatMvFuzz"),
    ("test_incremental_mv.py", "TestFilteredJoinMv"),
    ("test_incremental_mv.py", "TestFilteredMv"),
    ("test_incremental_mv.py", "TestRewriteWithMv"),
    ("test_rollup_mv.py", "TestRollupConvergenceFuzz"),
    ("test_llm_ops.py", "TestIvfPq"),
    ("test_llm_ops.py", "TestIvfKmeansTraining"),
    ("test_cdf_stream.py", "TestBatchCdfReader"),
    ("test_advice_r11.py", "TestBoundedTriggerAcrossRename"),
    ("test_cdf_planning.py", "TestCheckpointServedPlan"),
    ("test_versioned.py", "TestModelBasedSequences"),
    ("test_versioned.py", "TestBloomSkipping"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        cls = item.cls.__name__ if item.cls is not None else None
        if fname in _SLOW_FILES or (fname, cls) in _SLOW_CLASSES:
            item.add_marker(pytest.mark.slow)


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
