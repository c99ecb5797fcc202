"""Candidate-pruned heavy hitters: exactness, partitioning independence,
and the per-partition candidate bound."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_stream_import_spark.operators.heavy import heavy_hitters


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 → 600 rows (30%), key 1 → 300, key 2 → 100, rest singletons
    base = spark.range(0, 1000).select(
        F.when(F.col("id") < 600, 0)
        .when(F.col("id") < 900, 1)
        .otherwise(F.col("id"))
        .alias("k")
    )
    return base


def _expected(df, num, denom):
    total = df.count()
    rows = (
        df.groupBy("k").count().filter(F.col("count") * denom >= num * total)
    ).collect()
    return sorted((r.k, r["count"]) for r in rows)


def test_exact_vs_plain_groupby(spark, skewed):
    got = heavy_hitters(skewed, "k", num=5, denom=100).collect()
    assert sorted((r.k, r.n_rows) for r in got) == _expected(skewed, 5, 100)


def test_partitioning_independent(spark, skewed):
    a = heavy_hitters(skewed.repartition(1), "k", num=5, denom=100).collect()
    b = heavy_hitters(
        skewed.repartition(17, "k"), "k", num=5, denom=100
    ).collect()
    c = heavy_hitters(skewed.repartition(17), "k", num=5, denom=100).collect()
    key = lambda rows: sorted((r.k, r.n_rows, r.share_ppm) for r in rows)
    assert key(a) == key(b) == key(c)


def test_exact_threshold_boundary(spark):
    # 4 of 40 rows = exactly 10%: >= must include it
    df = spark.range(0, 40).select(
        F.when(F.col("id") < 4, 99).otherwise(F.col("id")).alias("k")
    )
    got = heavy_hitters(df, "k", num=1, denom=10).collect()
    assert [(r.k, r.n_rows, r.share_ppm) for r in got] == [(99, 4, 100000)]


def test_null_keys_count_as_a_group(spark):
    """NULL is a group under groupBy/HAVING semantics: a frequent NULL
    key must surface, and other keys' shares use the full row count."""
    rows = [(None,)] * 30 + [(1,)] * 15 + [(2,)] * 5 + [(i,) for i in range(100, 150)]
    df = spark.createDataFrame(rows, "k int").repartition(5)
    got = sorted(
        (
            (r.k, r.n_rows, r.share_ppm)
            for r in heavy_hitters(df, "k", num=1, denom=10).collect()
        ),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    # total = 100 rows; threshold 10% → null (30) and 1 (15)
    assert got == [(1, 15, 150000), (None, 30, 300000)]


def test_two_fact_scans_only(spark, skewed):
    """The docstring claims two passes over the fact input: the final
    plan must contain exactly one MapInPandas (pass 1, checkpointed)
    and one recount aggregate — the total must NOT add a third scan."""
    df = skewed
    out = heavy_hitters(df, "k", num=5, denom=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 0  # pass 1 already materialized
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_empty_input_yields_empty_result(spark):
    df = spark.createDataFrame([], "k long")
    assert heavy_hitters(df, "k", num=1, denom=10).collect() == []


def test_snowflake_scale_keys_with_nulls_survive(spark):
    """Keys above 2^53 alongside NULLs in the same partition: the Arrow
    pass must keep exact int64 identity (a pandas conversion would
    widen to float64 and round the key away)."""
    big = (1 << 60) + 12345  # not representable in float64
    rows = [(big,)] * 20 + [(None,)] * 20 + [(i,) for i in range(60)]
    df = spark.createDataFrame(rows, "k long").coalesce(1)
    got = {
        r.k: r.n_rows
        for r in heavy_hitters(df, "k", num=1, denom=10).collect()
    }
    assert got == {big: 20, None: 20}
