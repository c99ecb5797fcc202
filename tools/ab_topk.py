"""Interleaved A/B: mapInPandas local-top-k prune vs pure-window
(WindowGroupLimit) forms of topk_per_group and knn_topk_partial.

One session, registry logic inlined, alternating A/B/A/B per pass so
host CPU-steal phases hit both arms equally. Prints per-arm min times.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F, Window as W

from file_stream_import_spark.io.tables import load_table
from file_stream_import_spark.operators import similarity
from file_stream_import_spark.queries.relational import topk_per_group

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def topk_pure_window(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def knn_pure_window(vectors, queries, k=5):
    return similarity.knn_bruteforce(vectors, queries, k=k)


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ab_topk")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    arms = {
        "topk_pandas": lambda: topk_per_group(spark, SF_DIR),
        "topk_window": lambda: topk_pure_window(spark, SF_DIR),
        "knn_pandas": lambda: similarity.knn_topk_partial(emb, queries, k=5),
        "knn_window": lambda: knn_pure_window(emb, queries, k=5),
    }

    # warm-up each arm once
    for name, fn in arms.items():
        fn().count()

    times: dict[str, list[float]] = {n: [] for n in arms}
    for _pass in range(5):
        for name, fn in arms.items():
            t0 = time.monotonic()
            fn().count()
            times[name].append(time.monotonic() - t0)

    for name, ts in times.items():
        print(
            f"{name}: min {min(ts):.3f}s  median {sorted(ts)[len(ts)//2]:.3f}s  "
            f"all {[round(t, 3) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
