"""Runs every registered query against its DuckDB oracle SQL — the local
mirror of the driver's CORRECTNESS gate. Queries without oracle SQL get a
rows-run smoke check (driver applies the same weaker check)."""

from __future__ import annotations

import pytest

from file_stream_import_spark.queries import all_oracle_sql, all_queries

from .conftest import assert_frames_match

QUERIES = all_queries()
ORACLE = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE:
        assert_frames_match(df, duck.sql(ORACLE[name]), name)
    else:
        # rows-only check: it runs and has a stable, non-degenerate schema
        rows = df.limit(1000).collect()
        assert df.schema.fieldNames(), f"{name}: empty schema"
        assert rows is not None


def test_registry_invariants():
    """Every registered query carries oracle SQL (100% of the registry
    is hash-checkable since r5 — no rows-only asterisks), and the
    registry rejects cross-module name collisions instead of silently
    replacing a query (the r5 retention_cohorts lesson)."""
    from file_stream_import_spark.queries import register

    assert set(QUERIES) == set(ORACLE)

    with pytest.raises(ValueError, match="already registered"):
        @register("retention_cohorts")
        def impostor(spark, sf_dir):  # pragma: no cover
            raise AssertionError
