#!/usr/bin/env python3
"""Scale evidence for the streaming CDF diff kernel (r12): explaining
one rewrite commit must cost O(the commit's delta), never O(table).

Builds tables with 4 / 16 / 64 committed groups (16x the table data
across the span) and applies the SAME bounded rewrite to each (a
pruned MERGE touching one group's key range). Then times:

  * kernel: _cdf_diff_arrow on the rewrite version directly (what one
    executor task runs);
  * stream: a full readchangedata stream draining ONLY the rewrite
    version (startingversion pins it), end to end through Spark.

A table-coupled implementation would scale with group count; the
manifest shared-group skip keeps both flat — only the group(s) the
MERGE rewrote are read on either side of the diff.

Usage: python tools/ab_cdf.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from file_stream_import_spark.io.pysource import (
        TableChangefeedDataSource,
        _cdf_diff_arrow,
    )
    from file_stream_import_spark.io.versioned import (
        VersionedTable,
        _schema_from_json,
        merge_into,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab_cdf")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(TableChangefeedDataSource)

    out = {"groups": [], "kernel_sec": [], "stream_sec": []}
    tmps = []
    try:
        for n_groups in (4, 16, 64):
            t = VersionedTable(
                tempfile.mkdtemp(prefix=f"ab_cdf_{n_groups}_")
            )
            tmps.append(t.path)
            per = 20_000
            for i in range(n_groups):
                t.commit(
                    spark.range(i * per, (i + 1) * per)
                    .select(
                        F.col("id").alias("k"),
                        (F.col("id") % 1000).alias("v"),
                    )
                    .coalesce(1),
                    mode="append" if i else "overwrite",
                )
            # the bounded rewrite: 2k keys inside group 0's range only
            upd = (
                spark.range(0, 2_000)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") % 1000 + 1).alias("v"),
                )
                .localCheckpoint(eager=True)
            )
            merge_into(t, spark, upd, key="k")
            rv = t.latest_version()
            declared = _schema_from_json(t._load_manifest(rv)["schema"])

            out["groups"].append(n_groups)
            out["kernel_sec"].append(
                timed(
                    lambda t=t, rv=rv, declared=declared: _cdf_diff_arrow(
                        t.path, None, rv, ["k"], declared
                    )
                )
            )

            def drain(t=t, rv=rv):
                ckpt = tempfile.mkdtemp(prefix="ab_cdf_ck_")
                try:
                    q = (
                        spark.readStream.format("table_changefeed")
                        .option("path", t.path)
                        .option("readchangedata", "true")
                        .option("key", "k")
                        .option("startingversion", str(rv))
                        .load()
                        .writeStream.format("noop")
                        .option("checkpointLocation", ckpt)
                        .start()
                    )
                    try:
                        q.processAllAvailable()
                    finally:
                        q.stop()
                finally:
                    shutil.rmtree(ckpt, ignore_errors=True)

            out["stream_sec"].append(timed(drain, reps=3))
        k0, kN = out["kernel_sec"][0], out["kernel_sec"][-1]
        s0, sN = out["stream_sec"][0], out["stream_sec"][-1]
        out["kernel_ratio_at_16x_groups"] = round(kN / max(k0, 1e-9), 2)
        out["stream_ratio_at_16x_groups"] = round(sN / max(s0, 1e-9), 2)
        print(json.dumps(out))
    finally:
        for p in tmps:
            shutil.rmtree(p, ignore_errors=True)


if __name__ == "__main__":
    main()
