"""Unit tests for the round-3 operators: CDC changelog merge, SCD2
history, sub-document chunk dedup, hash split, inverted index, BM25."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_stream_import_spark.operators import cdc, curation, dedup, text


# ---------------------------------------------------------------------------
# CDC
# ---------------------------------------------------------------------------


def test_apply_changelog_last_op_wins_and_deletes(spark):
    changes = spark.createDataFrame(
        [
            # key 1: U v1 → U v2 → survives with v2 payload
            (1, 1, "U", "a"),
            (1, 2, "U", "b"),
            # key 2: U v1 → D v2 → deleted
            (2, 1, "U", "x"),
            (2, 2, "D", None),
            # key 3: D v1 → U v2 → resurrected (delete is not terminal)
            (3, 1, "D", None),
            (3, 2, "U", "z"),
        ],
        "k int, v int, op string, payload string",
    )
    out = cdc.apply_changelog(changes, ["k"], ["v"]).orderBy("k").collect()
    assert [(r.k, r.payload, r.n_ops) for r in out] == [(1, "b", 2), (3, "z", 2)]


def test_apply_changelog_order_cols_break_ties(spark):
    # same version number: the second order column decides
    changes = spark.createDataFrame(
        [(1, 1, 10, "U", "old"), (1, 1, 20, "U", "new")],
        "k int, v int, seq int, op string, payload string",
    )
    out = cdc.apply_changelog(changes, ["k"], ["v", "seq"]).collect()
    assert out[0].payload == "new"


def test_scd2_history_intervals(spark):
    changes = spark.createDataFrame(
        [(1, "2020-01-01", "A"), (1, "2020-02-01", "B"), (2, "2020-03-01", "C")],
        "k int, ts string, status string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = (
        cdc.scd2_history(changes, ["k"], "ts")
        .orderBy("k", "ts")
        .collect()
    )
    assert [r.is_current for r in out] == [False, True, True]
    assert out[0].valid_to == out[1].valid_from  # closed by the next change
    assert out[1].valid_to is None and out[2].valid_to is None


# ---------------------------------------------------------------------------
# Chunk dedup
# ---------------------------------------------------------------------------


def test_chunk_dedup_removes_cross_doc_repeats(spark):
    shared = "one two three four five six seven eight"  # exactly one chunk
    docs = spark.createDataFrame(
        [(1, shared + " tail one"), (2, shared), (3, "totally different words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.chunk_dedup(docs, chunk_tokens=8).collect()}
    # doc 1 owns the first occurrence: nothing removed
    assert out[1].n_chunks == 2 and out[1].n_dup_chunks == 0
    # doc 2 is exactly the shared chunk → fully removed
    assert out[2].n_chunks == 1 and out[2].n_dup_chunks == 1
    import hashlib

    assert out[2].kept_md5 == hashlib.md5(b"").hexdigest()
    assert out[3].n_dup_chunks == 0


def test_chunk_dedup_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "just three words"), (2, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.chunk_dedup(docs).collect()}
    assert rows[1].n_chunks == 1  # partial chunk still emitted
    assert 2 not in rows  # empty text → no chunks → no output row


def test_chunk_dedup_within_doc_repeat(spark):
    c = "a b c d e f g h"
    docs = spark.createDataFrame(
        [(7, f"{c} {c}")], "doc_id long, text string"
    )
    r = dedup.chunk_dedup(docs, chunk_tokens=8).collect()[0]
    assert (r.n_chunks, r.n_dup_chunks) == (2, 1)


# ---------------------------------------------------------------------------
# Hash split
# ---------------------------------------------------------------------------


def test_hash_split_deterministic_and_complete(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = curation.hash_split(df, "doc_id")
    agg = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(agg) == {"train", "val", "test"}
    assert sum(agg.values()) == 1000
    assert agg["train"] > agg["val"] and agg["train"] > agg["test"]
    # stable across invocations (no RNG)
    a = out.select("doc_id", "split").collect()
    b = curation.hash_split(df, "doc_id").select("doc_id", "split").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hash_split_growth_stability(spark):
    """A document keeps its split when the corpus grows — the property
    that prevents train/test leakage across pipeline re-runs."""
    small = curation.hash_split(
        spark.range(100).withColumnRenamed("id", "doc_id"), "doc_id"
    )
    big = curation.hash_split(
        spark.range(10_000).withColumnRenamed("id", "doc_id"), "doc_id"
    ).filter(F.col("doc_id") < 100)
    assert sorted(map(tuple, small.select("doc_id", "split").collect())) == sorted(
        map(tuple, big.select("doc_id", "split").collect())
    )


# ---------------------------------------------------------------------------
# Inverted index + BM25
# ---------------------------------------------------------------------------


def test_inverted_index_truncates_postings(spark):
    docs = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 5 else "filler")) for i in range(30)],
        "doc_id long, text string",
    )
    out = {r.term: r for r in text.inverted_index(docs, max_postings=10).collect()}
    assert out["common"].df == 30  # df counts ALL docs...
    assert out["common"].postings_head == ",".join(map(str, range(10)))  # ...head truncated
    assert out["rare"].df == 1 and out["rare"].postings_head == "5"


def test_bm25_prefers_higher_tf_and_rarer_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad pad pad pad pad"),
            (2, "spark pad pad pad pad pad pad pad"),
            (3, "pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.bm25_scores(docs, ["spark"]).collect()}
    assert 3 not in out  # no query term → no row
    assert out[1].bm25 > out[2].bm25 > 0  # tf monotone
    assert out[1].n_terms_hit == 1


def test_bm25_doc_length_normalization(spark):
    # same tf, longer doc → lower score (the b·dl/avgdl penalty)
    docs = spark.createDataFrame(
        [(1, "spark " + "pad " * 4), (2, "spark " + "pad " * 40)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.bm25_scores(docs, ["spark"]).collect()}
    assert out[1].bm25 > out[2].bm25


# ---------------------------------------------------------------------------
# Plan shapes (100 TB guards)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "build",
    [
        lambda spark: cdc.apply_changelog(
            spark.range(100)
            .select(
                (F.col("id") % 10).alias("k"),
                F.col("id").alias("v"),
                F.lit("U").alias("op"),
            ),
            ["k"],
            ["v"],
        ),
        lambda spark: dedup.chunk_dedup(
            spark.range(100).select(
                F.col("id").alias("doc_id"),
                F.lit("a b c d e f g h i j").alias("text"),
            )
        ),
    ],
    ids=["apply_changelog", "chunk_dedup"],
)
def test_no_single_partition_exchange(spark, build):
    plan = build(spark)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_hash_split_is_pure_projection(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    plan = (
        curation.hash_split(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # no shuffle at all


# ---------------------------------------------------------------------------
# Large-star/small-star connected components
# ---------------------------------------------------------------------------


def _cc_pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


@pytest.mark.parametrize(
    "edges,expect",
    [
        # long chain — the adversarial case for label propagation
        ([(i, i + 1) for i in range(20)], {i: 0 for i in range(21)}),
        # two components + a clique
        (
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
            {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20},
        ),
        # star already
        ([(5, 1), (5, 2), (5, 9)], {1: 1, 2: 1, 5: 1, 9: 1}),
    ],
    ids=["chain", "multi", "star"],
)
def test_cluster_pairs_star_components(spark, edges, expect):
    out = dedup.cluster_pairs_star(_cc_pairs(spark, edges)).collect()
    assert {r.doc_id: r.cluster_id for r in out} == expect


def test_cluster_pairs_star_matches_label_propagation(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = _cc_pairs(spark, edges)
    star = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_pairs_star(pairs).collect()
    }
    prop = {
        (r.doc_id, r.cluster_id)
        for r in dedup.cluster_pairs(pairs).collect()
    }
    assert star == prop


# ---------------------------------------------------------------------------
# Salted join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    from file_stream_import_spark.operators.skew import salted_join

    big = spark.range(500).select(
        F.col("id").alias("row_id"), (F.col("id") % 3).alias("k")
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    salted = salted_join(big, small, "k", "row_id", n_salts=8)
    plain = big.join(small, "k")
    assert salted.count() == 500
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert "__salt" not in salted.columns


def test_salted_join_left_outer_keeps_unmatched(spark):
    from file_stream_import_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 10), (2, 20)], "k long, row_id long")
    small = spark.createDataFrame([(1, "x")], "k long, v string")
    out = salted_join(big, small, "k", "row_id", n_salts=4, how="left")
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: "x", 2: None}


# ---------------------------------------------------------------------------
# Co-occurrence df-cap (r7)
# ---------------------------------------------------------------------------


def test_cooccurrence_df_cap_excludes_hot_parts(spark, tmp_path):
    """A part in more than 64 orders contributes ZERO pairs (the
    stop-item cut): the pair table is bounded by df_cap x order_size
    per part no matter how skewed the catalog is."""
    from file_stream_import_spark.queries.round6 import (
        part_cooccurrence_topk,
    )

    rows = []
    # hot part 999 rides in 100 orders (df=100 > 64)
    for o in range(100):
        rows.append((o, 999))
    # parts 1 and 2 co-occur in 5 of those orders (df=5 each)
    for o in range(5):
        rows += [(o, 1), (o, 2)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = part_cooccurrence_topk(spark, str(tmp_path)).collect()
    parts = {r.part for r in out} | {r.other for r in out}
    assert 999 not in parts  # hot part capped out of the pair table
    got = {(r.part, r.other): r.cnt for r in out}
    assert got == {(1, 2): 5, (2, 1): 5}
