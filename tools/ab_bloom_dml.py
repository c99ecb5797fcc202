"""A/B: auto-pruned point DELETE on a hash-keyed table WITH vs WITHOUT
per-group Bloom filters (r10 — the bloom refinement in
_rewrite_pruned's touch computation). Hash keys make every group's
min/max box span the whole key space, so box pruning alone rewrites
everything; the blooms are what restore O(delta).

Run: python tools/ab_bloom_dml.py   (sf0.1 orders, 16 groups)
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_GROUPS = 16


def build(spark, tmp, with_blooms: bool):
    from file_stream_import_spark.io.versioned import VersionedTable

    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        F.md5(F.col("o_orderkey").cast("string")).alias("uid"),
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    t = VersionedTable(os.path.join(tmp, "t"))
    t.commit(o.filter(F.col("k") % N_GROUPS == 0), mode="overwrite")
    if with_blooms:
        t.set_bloom_columns(spark, ["uid"])
    for i in range(1, N_GROUPS):
        t.commit(o.filter(F.col("k") % N_GROUPS == i), mode="append")
    if with_blooms:
        # rebuild group 0 with blooms too (cluster keeps 16 groups)
        t.optimize(spark, cluster_by="k", target_groups=N_GROUPS)
    return t


def main():
    import hashlib

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_bloom_dml")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    uid = hashlib.md5(b"77").hexdigest()
    for label, blooms in (("no blooms", False), ("with blooms", True)):
        best, carried = None, None
        for _ in range(3):
            tmp = tempfile.mkdtemp(prefix="ab_bdml_")
            try:
                t = build(spark, tmp, blooms)
                before = set(
                    t._load_manifest(t.latest_version())["groups"]
                )
                t0 = time.time()
                t.delete_where(
                    spark, F.col("uid") == uid, prune_where="auto"
                )
                dt = time.time() - t0
                after = set(
                    t._load_manifest(t.latest_version())["groups"]
                )
                carried = len(before & after)
                assert (
                    t.read(spark).filter(F.col("uid") == uid).count()
                    == 0
                )
                best = dt if best is None else min(best, dt)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        print(
            f"{label}: point delete best-of-3 {best:.3f}s, "
            f"groups carried by reference {carried}/{N_GROUPS}"
        )


if __name__ == "__main__" and "--sf10" not in sys.argv:
    main()


def sf10_point():
    """The 100x-groups scale point (pairs with tools/scale_lake_sf10):
    a 400-group bloom-keyed table from the sf10 build; ONE point
    delete must carry ~399 groups by reference and an absent key must
    be a metadata no-op — the carried count is the claim, measured at
    two decades like the rest of the r10 lake table."""
    import hashlib

    from pyspark.sql import Window as W

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_bloom_dml_sf10")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import scale_sf10

    scale_sf10.build(spark)
    from file_stream_import_spark.io.versioned import VersionedTable

    o = spark.read.parquet(
        os.path.join(scale_sf10.DST, "orders.parquet")
    ).select(
        F.md5(F.col("o_orderkey").cast("string")).alias("uid"),
        F.row_number().over(W.orderBy("o_orderkey")).alias("k"),
    )
    tmp = tempfile.mkdtemp(prefix="ab_bdml10_")
    try:
        t = VersionedTable(os.path.join(tmp, "t"))
        # empty seed so blooms can be declared before the real commit
        # (empty-group stats prove it unmatchable — it never rewrites)
        t.commit(o.filter(F.lit(False)), mode="overwrite")
        t.set_bloom_columns(spark, ["uid"])
        t0 = time.time()
        t.commit(o, mode="append", partition_by=["bucket(400, k)"])
        print(f"sf10 build (400 bloom'd groups): {time.time()-t0:.1f}s")
        n_groups = len(t._load_manifest(t.latest_version())["groups"])
        uid = hashlib.md5(b"12345").hexdigest()
        before = set(t._load_manifest(t.latest_version())["groups"])
        t0 = time.time()
        t.delete_where(spark, F.col("uid") == uid, prune_where="auto")
        dt = time.time() - t0
        after = set(t._load_manifest(t.latest_version())["groups"])
        print(
            f"sf10 point delete: {dt:.3f}s, carried "
            f"{len(before & after)}/{n_groups} groups"
        )
        v = t.latest_version()
        t0 = time.time()
        t.delete_where(
            spark, F.col("uid") == "0" * 32, prune_where="auto"
        )
        print(
            f"sf10 absent-key delete: {time.time()-t0:.3f}s, "
            f"metadata no-op: {t.latest_version() == v}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__" and "--sf10" in sys.argv:
    sf10_point()
