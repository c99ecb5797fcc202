"""Property tests for the ML-prep and graph query batch: the invariants
behind the engine-stability claims (determinism under repartitioning,
probability-mass conservation, code-range bounds) that the oracle compare
alone doesn't pin down."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_stream_import_spark.queries import all_queries

QUERIES = all_queries()


class TestWeightedSample:
    def test_at_most_k_per_group_and_subset(self, spark, sf_dir):
        out = QUERIES["weighted_sample_topk"](spark, sf_dir)
        per_group = out.groupBy("l_returnflag").count().collect()
        assert all(r["count"] <= 5 for r in per_group)
        # every sampled row exists in the source
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber"
        )
        extra = out.join(
            li,
            (out["l_orderkey"] == li["l_orderkey"])
            & (out["l_linenumber"] == li["l_linenumber"]),
            "left_anti",
        )
        assert extra.count() == 0

    def test_deterministic_under_partitioning(self, spark, sf_dir):
        """The md5 draw must make the sample independent of physical
        layout — the reproducibility claim in the docstring."""
        from file_stream_import_spark.queries import mlprep

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        rows = []
        for n_parts in (1, 7):
            u = mlprep._hash_u01(
                F.lit("ws=1:"),
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
            k = F.floor(F.log(u) * 1e12 + F.lit(0.5)) / F.col("l_extendedprice")
            from pyspark.sql import Window as W

            w = W.partitionBy("l_returnflag").orderBy(
                F.col("k").desc(), "l_orderkey", "l_linenumber"
            )
            got = (
                li.repartition(n_parts)
                .withColumn("k", k)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= 5)
                .select("l_returnflag", "l_orderkey", "l_linenumber")
                .collect()
            )
            rows.append(sorted(map(tuple, got)))
        assert rows[0] == rows[1]


class TestPageRank:
    def test_mass_conserved_and_positive(self, spark, sf_dir):
        out = QUERIES["pagerank_bipartite"](spark, sf_dir).collect()
        total = sum(r["pagerank"] for r in out)
        # bidirectional edges → no dangling mass; sum stays 1 up to the
        # 1e-9 output grid (n nodes × grid error)
        assert abs(total - 1.0) < 1e-6 * len(out)
        assert all(r["pagerank"] > 0 for r in out)

    def test_suppliers_concentrate_mass(self, spark, sf_dir):
        # ~10 suppliers vs ~1500 customers: each supplier connects to many
        # customers, so any supplier outranks any customer
        out = QUERIES["pagerank_bipartite"](spark, sf_dir).collect()
        smin = min(r["pagerank"] for r in out if r["node"].startswith("s"))
        cmax = max(r["pagerank"] for r in out if r["node"].startswith("c"))
        assert smin > cmax


class TestQuantize:
    def test_codes_bounded_and_error_within_half_step(self, spark, sf_dir):
        out = QUERIES["embedding_quantize_int8"](spark, sf_dir)
        rows = out.collect()
        assert all(r["n_dims"] == 64 for r in rows)
        # checksum = sum(q_i * i), q_i ∈ [0,255], i ∈ [1,64] → hard bound
        assert all(0 <= r["checksum"] <= 255 * 64 * 65 // 2 for r in rows)
        # reconstruction error ≤ half a quantization step of the widest
        # dimension range; ranges here are ~O(1), so 0.5/255 * range << 0.01
        assert all(r["max_abs_err"] < 0.01 for r in rows)


class TestConstraintSuite:
    def test_fixture_tables_are_clean(self, spark, sf_dir):
        out = {
            r["constraint_name"]: r["violations"]
            for r in QUERIES["constraint_check"](spark, sf_dir).collect()
        }
        assert len(out) == 7
        # the driver fixtures satisfy every constraint — any nonzero here
        # means the suite (or the fixtures) changed
        assert all(v == 0 for v in out.values()), out


class TestRfm:
    def test_quartiles_complete_and_bounded(self, spark, sf_dir):
        out = QUERIES["rfm_segmentation"](spark, sf_dir)
        agg = out.agg(
            F.min("r_quartile"), F.max("r_quartile"),
            F.min("f_quartile"), F.max("f_quartile"),
            F.min("m_quartile"), F.max("m_quartile"),
            F.count("*"),
        ).collect()[0]
        assert list(agg)[:6] == [1, 4, 1, 4, 1, 4]

    def test_one_row_per_ordering_customer(self, spark, sf_dir):
        out = QUERIES["rfm_segmentation"](spark, sf_dir)
        n_cust = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert out.count() == n_cust
        assert out.select("c_custkey").distinct().count() == n_cust
