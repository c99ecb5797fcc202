#!/usr/bin/env python3
"""A/B: long-backfill CDF PLANNING — checkpoint-served (r14) vs
manifest-walked (pre-r14).

Fixture: a 401-group partitioned table (2M rows) followed by 301
single-row appends — the BASELINE 302-version backfill shape. Times
`TableChangefeedBatchReader(...).partitions()` both ways (the walked
form is forced by patching the plan-row threshold) and asserts the
partition sets are IDENTICAL.

Measured (2026-08-16, local[32]): walked 2.368 s / 908 manifest JSON
parses vs served 0.503 s / 138 parses (floor probe + the <=63-version
tail past the last checkpoint extension x 3 consumers) — 4.7x, same
1003 partitions.

Run: python tools/ab_cdf_plan.py
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(fn, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4), out


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", CPUS)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import file_stream_import_spark.io.pysource as ps
    from file_stream_import_spark.io.pysource import (
        TableChangefeedBatchReader,
    )
    from file_stream_import_spark.io.versioned import VersionedTable

    root = tempfile.mkdtemp(prefix="ab_cdf_plan_")
    try:
        t = VersionedTable(os.path.join(root, "t"))
        o = spark.range(1, 2_000_001).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("string").alias("status"),
            (F.col("id") * 13 % 1_000_000).alias("cents"),
        )
        t.commit(
            o, mode="overwrite", partition_by=["truncate(5000, k)"]
        )
        base = spark.createDataFrame(
            [(0, "x", 1)], "k long, status string, cents long"
        ).localCheckpoint(eager=True)
        for i in range(301):
            t.commit(
                base.select(
                    (F.col("k") - 1 - i).alias("k"), "status", "cents"
                ),
                mode="append",
            )

        opts = {
            "path": t.path,
            "readchangedata": "true",
            "key": "k",
            "startingversion": "0",
        }

        def plan():
            return TableChangefeedBatchReader(opts).partitions()

        served_s, served = timed(plan)
        orig = ps._CKPT_PLAN_MIN
        ps._CKPT_PLAN_MIN = 10**9  # force the manifest walk
        try:
            walked_s, walked = timed(plan)
        finally:
            ps._CKPT_PLAN_MIN = orig

        def key(p):
            return (
                str(getattr(p, "file_path", None)),
                str(getattr(p, "version", None)),
                str(getattr(p, "commit_version", None)),
            )

        identical = sorted(map(key, served)) == sorted(
            map(key, walked)
        )
        print(
            json.dumps(
                {
                    "versions": int(t.latest_version()) + 1,
                    "groups_at_v0": 401,
                    "plan_served_sec": served_s,
                    "plan_walked_sec": walked_s,
                    "speedup": round(walked_s / max(served_s, 1e-9), 2),
                    "partitions": len(served),
                    "plans_identical": bool(identical),
                }
            )
        )
        assert identical, "plan mismatch between served and walked"
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
