"""Bloom runtime-filter operator: no false negatives ever, bounded false
positives at the design point, and exact-join cleanup under a
deliberately undersized bitmap."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_stream_import_spark.operators.bloom import (
    bloom_build,
    bloom_filtered_semi_join,
    bloom_might_contain,
)


@pytest.fixture(scope="module")
def keyed(spark):
    dim = spark.range(0, 200).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    return dim, fact


def test_no_false_negatives(spark, keyed):
    dim, fact = keyed
    bitmap = bloom_build(dim, "k")
    passed = fact.filter(bloom_might_contain(bitmap, F.col("k"))).select("k")
    members = {r.k for r in dim.collect()}
    got = {r.k for r in passed.collect()}
    assert members & set(range(5000)) <= got, "a member key was dropped"


def test_false_positive_rate_at_design_point(spark, keyed):
    dim, fact = keyed
    # 200 keys in 65536 bits (~327 bits/key) with 2 hashes: fp well
    # under 1%; allow 2% slack for hash clustering on this tiny domain.
    bitmap = bloom_build(dim, "k")
    passed = fact.filter(bloom_might_contain(bitmap, F.col("k"))).count()
    true_hits = 5000 // 7 + 1
    assert passed - true_hits <= 0.02 * 5000


def test_undersized_bitmap_still_exact(spark, keyed):
    """With m_bits=256 for 200 keys the filter MUST false-positive
    heavily — the exact semi-join behind it must still produce the
    plain-join answer."""
    dim, fact = keyed
    out = bloom_filtered_semi_join(fact, dim, "k", "k", m_bits=256)
    expect = fact.join(
        dim.withColumnRenamed("k", "dk").distinct(),
        F.col("k") == F.col("dk"),
        "left_semi",
    )
    assert sorted(r.k for r in out.collect()) == sorted(
        r.k for r in expect.collect()
    )
    # and the tiny bitmap really does let false positives through,
    # proving the cleanup join is load-bearing in this test
    bitmap = bloom_build(dim, "k", m_bits=256)
    passed = fact.filter(
        bloom_might_contain(bitmap, F.col("k"), m_bits=256)
    ).count()
    assert passed > out.count()


def test_prefilter_is_projection_before_join(spark, keyed):
    """Plan shape: the bloom membership test must sit in a Filter above
    the fact scan (pre-exchange), not inside/after the semi-join."""
    dim, fact = keyed
    plan = bloom_filtered_semi_join(
        fact, dim, "k", "k"
    )._jdf.queryExecution().optimizedPlan().toString()
    join_pos = plan.find("Join LeftSemi")
    filt_pos = plan.find("xxhash64")
    assert join_pos != -1 and filt_pos != -1
    assert filt_pos > join_pos, (
        "bloom filter should appear BELOW the semi join in the plan tree "
        f"(printed after it):\n{plan}"
    )


def test_empty_dim_yields_empty_result(spark, keyed):
    """An empty build side → all-zero bitmap → every probe misses; the
    composition returns the plain semi-join's (empty) answer without
    errors."""
    dim, fact = keyed
    empty = dim.filter(F.lit(False))
    assert bloom_filtered_semi_join(fact, empty, "k", "k").count() == 0


def test_bad_m_bits_fails_loudly(spark, keyed):
    import pytest as _pytest

    dim, _ = keyed
    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(dim, "k", m_bits=1000)
