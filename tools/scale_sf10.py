"""sf10 (100x sf0.1, ~60M lineitem rows) scale point — VERDICT r6 #5.

The r1-r6 scale evidence is a 10x curve (sf0.1 -> sf1, seven
scale_curve.py campaigns); this adds a SECOND decade for the five most
expensive queries so the trend line spans sf0.1 -> sf1 -> sf10 and a
hidden super-linear term has two chances to show. Same recipe as
tools/scale_curve.py — union key-shifted copies of the driver fixture
(dbgen's own cross-SF construction) — but only for the tables the five
targets read (lineitem, orders, events), at 100 copies.

Run: python tools/scale_sf10.py   (~10 min; /tmp/sf10 is reused if
present). Prints a BASELINE.md-ready table with sf0.1 and sf10 times.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf10"
COPIES = 100
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

SHIFT = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
}

TARGETS = [
    "part_cooccurrence_topk",
    "cdc_apply_into_lake",
    "lake_snapshot_diff",
    "lakehouse_upsert_lifecycle",
    "window_funnel_levels",
]


def _offset_key(c: str) -> str:
    head, _, tail = c.partition("_")
    return tail if len(head) == 1 else c


def build(spark: SparkSession) -> None:
    os.makedirs(DST, exist_ok=True)
    offsets: dict[str, int] = {}
    for t, cols in SHIFT.items():
        if os.path.exists(f"{DST}/{t}.parquet"):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c in cols:
            key = _offset_key(c)
            if key not in offsets:
                offsets[key] = df.agg(F.max(c)).first()[0] + 1
        # one projection with a copy-index explode beats unioning 100
        # plans: explode(sequence(0, 99)) then shift each key by
        # i * offset — a single scan, a single write
        cp = df.withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
        )
        for c in cols:
            cp = cp.withColumn(
                c, F.col(c) + F.col("__i") * F.lit(offsets[_offset_key(c)])
            )
        cp.drop("__i").write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"built {t}: {n} rows")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("scale_sf10")
        .config("spark.sql.shuffle.partitions", "128")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)

    from file_stream_import_spark.queries import all_queries

    qs = all_queries()
    print("| query | sf0.1 | sf10 | ratio at 100x data |")
    print("|---|---|---|---|")
    for name in TARGETS:
        times = []
        for sf_dir in (SRC, DST):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            n = df.count()
            times.append(time.time() - t0)
        r = times[1] / times[0]
        print(
            f"| {name} | {times[0]:.3f} | {times[1]:.3f} | {r:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
