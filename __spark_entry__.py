"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``file_stream_import_spark`` package; this
module just adapts the registry to the driver's API.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _ensure_session_conf(spark: SparkSession) -> None:
    """Session-level settings the queries rely on; safe to set at runtime."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # Wide aggregates (the 128-column MinHash signature) exceed the
        # default codegen width cutoff (100 fields) and silently fall
        # back to interpreted evaluation — measured 1.6x slower on the
        # signature stage. Scale-independent: a codegen width limit,
        # not a core-count or data-size tunable.
        spark.conf.set("spark.sql.codegen.maxFields", "200")
    except Exception:
        pass
    try:
        # events.parquet stores TIMESTAMP(NANOS); Spark's reader needs this
        # to read it (as long; io.tables converts to a µs timestamp).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from file_stream_import_spark.queries import all_queries

    _ensure_session_conf(spark)
    return all_queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from file_stream_import_spark.queries import all_queries

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_session_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted ⇒ rows-only check)."""
    from file_stream_import_spark.queries import all_oracle_sql

    return all_oracle_sql()
