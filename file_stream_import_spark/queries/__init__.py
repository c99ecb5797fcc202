"""Query registry — the single source of truth consumed by __spark_entry__.py.

Every implemented operator registers here as a named callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string over the same parquet tables. The driver hash-compares
the two at sf0.01 (columns sorted by name, order-insensitive value hash),
so:

  * every computed column is aliased IDENTICALLY in both forms;
  * double aggregates are rounded identically on both sides (a sum of
    600k doubles differs in the last ulp between engines depending on
    reduction order — rounding to a fixed scale makes the hash stable);
  * dates/timestamps in output are formatted to strings identically
    (sidesteps ns-vs-us precision and tz-serialization differences);
  * integer-valued computed columns are cast to BIGINT on both sides
    (DuckDB SUM(int) yields HUGEINT, which pandas renders as float).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query to the registry, optionally with oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import llm, relational, streaming_batch, tpch  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
